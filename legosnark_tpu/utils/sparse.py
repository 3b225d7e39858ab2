"""Sparse vectors/matrices + sparse MSM.

TPU-native counterpart of `/root/reference/src/utils/matrix.h` (the
`CoeffPos` col-major sparse types) and `sparsemexp.{h,cc}` (sparse
multi-exponentiation that skips zeros and plain-adds ones).

TPU shape: a sparse vector is (values [L, nnz], positions [nnz]) with a
STATIC nnz (pad with zero values — padding entries contribute the
identity, so correctness is automatic). The zero/one special-casing of
`sparsemexpS` (`sparsemexp.h:12-59`) becomes select masks: ones bypass
the scalar multiplication entirely (a gathered plain add), zeros die in
the bucket phase (digit 0 is never accumulated).
"""
from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, CurveOps
from ..curve import msm as msm_mod

FR = bn254.FR


class SparseVec(NamedTuple):
    """`CoeffPos<T>` list (`matrix.h:35-47`), structure-of-arrays."""

    values: Any     # [L, nnz] canonical Fr limbs (or point batch)
    positions: Any  # [nnz] int32


def from_dense_scalars(v_can, nnz: int | None = None) -> SparseVec:
    """Host-side: compress a canonical [L, n] scalar vector."""
    v = np.asarray(v_can)
    mask = ~(v == 0).all(axis=-2)
    pos = np.nonzero(mask)[0]
    vals = v[..., pos]
    if nnz is not None:
        pad = nnz - pos.shape[0]
        assert pad >= 0
        vals = np.concatenate(
            [vals, np.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1)
        pos = np.concatenate([pos, np.zeros((pad,), pos.dtype)])
    return SparseVec(jnp.asarray(vals), jnp.asarray(pos.astype(np.int32)))


def sparse_msm_scalars(C: CurveOps, points: Point, sv: SparseVec,
                       c: int | None = None) -> Point:
    """`sparsemexpS` (`sparsemexp.h:12-59`): dense G1 bases, sparse Fr
    coefficients. Gathers only the touched bases, then runs the dense
    windowed MSM over the nnz entries — zeros (and padding) vanish in
    the digit-0 bucket; the reference's `plain add the ones` shortcut
    is subsumed by the window phase (a one has a single nonzero digit)."""
    touched = msm_mod.point_index(points, sv.positions)
    return msm_mod.msm(C, touched, sv.values, c=c)


def sparse_msm_points(C: CurveOps, sv_points: SparseVec, exps_can,
                      c: int | None = None) -> Point:
    """`sparsemexpG` (`sparsemexp.h:62-90`): sparse G1 coefficients,
    dense Fr exponents — gather the exponents at the sparse positions."""
    e = jnp.take(exps_can, sv_points.positions, axis=-1)
    return msm_mod.msm(C, sv_points.values, e, c=c)


def sparse_inner_product(dense_mont, sv: SparseVec):
    """`sparseinnerproduct` (`sparsemexp.cc:26-33`): <dense, sparse>
    over Fr. sv.values here are Montgomery-form."""
    from ..prototools import mle
    gathered = jnp.take(dense_mont, sv.positions, axis=-1)
    return mle.field_sum(fl.mont_mul(FR, gathered, sv.values))


class SparseMatrix(NamedTuple):
    """Col-major sparse matrix (`matrix.h:49-61`): per-column sparse
    vectors with a shared static per-column nnz bound."""

    values: Any     # [ncols, L, nnz_max]
    positions: Any  # [ncols, nnz_max] row indices
    nrows: int


def insert_as_col_major(entries, nrows: int, ncols: int,
                        nnz_max: int, mont: bool = False) -> SparseMatrix:
    """Builder (`matrix.h:53-61`): entries = [(row, col, int value)].
    mont=True stores Montgomery-form values (the `sparse_inner_product`
    convention); default canonical (the sparse-MSM convention)."""
    vals = np.zeros((ncols, FR.nlimbs, nnz_max), dtype=np.uint32)
    pos = np.zeros((ncols, nnz_max), dtype=np.int32)
    fill = [0] * ncols
    for r, c_, v in entries:
        k = fill[c_]
        assert k < nnz_max
        enc = (FR.to_mont_int(v % bn254.R)[:, 0] if mont
               else fl.int_to_limbs(v % bn254.R, FR.nlimbs))
        vals[c_, :, k] = enc
        pos[c_, k] = r
        fill[c_] += 1
    return SparseMatrix(jnp.asarray(vals), jnp.asarray(pos), nrows)


def matvec_g1(M: SparseMatrix, points: Point) -> Point:
    """P_j = sum_k M[pos, j] * base[pos] per column — the keygen
    contraction `mtxmultiexp` (`subspace.cc:18-35`), vmapped over
    columns."""
    def col(vals, pos):
        touched = msm_mod.point_index(points, pos)
        return msm_mod.msm(G1, touched, vals, c=4)

    return jax.vmap(col)(M.values, M.positions)
