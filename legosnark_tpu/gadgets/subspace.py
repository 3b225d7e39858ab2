"""CPlink — Kiltz–Wee QA-NIZK subspace argument.

TPU-native re-design of `SubspaceSnark`
(`/root/reference/src/gadgets/subspace.{h,cc}`). Proves x = M*w for a
public matrix M of G1 elements and committed x (the LegoSNARK CPlink
gadget: "these two commitments open to the same vector").

  keygen (`subspace.cc:37-76`): sample k in Fr^l, a_hat in Fr;
      P = M^T k in G1^t, C_i = k_i * a in G2^l, a = a_hat * G2.
  prove (`subspace.cc:78-85`): ONE t-point MSM  pi = <P, w>.
  verify (`subspace.cc:106-133`): prod_i e(x_i, C_i) == e(pi, a),
      realized as a single batched product-of-pairings == 1 (identity
      x_i legs are masked out exactly like the reference's skip-zeros).
      `verifyLin3or4` (`subspace.cc:135-171`) is this same code at
      l = 3, 4 — no special-casing needed.

Two keygen paths, mirroring `scalarsAvailable` (`subspace.h:19`,
`subspace.cc:37-76`):
  * `keygen(M)` — dense [l, .., L, t] Point batch with identity points
    as structural zeros; P = sum_i k_i*M[i,:] by batched scalar-muls.
  * `keygen_scalar(sM)` — the reference's fast path: when the relation
    matrix is known as Fr SCALARS over a single base G (the linking
    relation is), P_j = (<k, sM[:, j]>) * G costs one sparse
    inner product + one fixed-base batch exponentiation
    (`sparseinnerproduct` + `mkG1Exp`), no curve adds over t at all.

Layout: point batches on the vector axis ([l] rows lead), Fr vectors
[L, t] (see fields/limb.py).
"""
from __future__ import annotations

from typing import NamedTuple, Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, G2, FR_OPS, g2_generator, point_map
from ..curve import msm as msm_mod
from ..prototools import mle
from ..utils import rand as lrand

FR = bn254.FR


class SubspaceKey(NamedTuple):
    P: Point   # [.., L, t] G1
    C: Point   # [.., L, l] G2
    a: Point   # G2


def proof_size_group_elements() -> dict:
    """The proof is a single G1 element (`subspace.cc:78-85`)."""
    return {"g1": 1, "g2": 0, "fr": 0}


def keygen(M: Point, seed: int = 0) -> SubspaceKey:
    """M: [l, .., L, t] G1 points (identity = structural zero)."""
    l = M.x.shape[0]
    rng = np.random.default_rng(seed ^ 0x5AB5)
    k_ints = lrand.rand_fr_ints(rng, l)
    a_hat = lrand.rand_fr_int(rng)

    # P = sum_i k_i * M[i, :]  — batched scalar-mul per row, tree add
    k_can = jnp.asarray(fl.ints_to_limbs(k_ints, FR.nlimbs))  # [L, l]
    k_rows = jnp.moveaxis(k_can, -1, 0)[..., None]            # [l, L, 1]
    scaled = G1.scalar_mul(M, k_rows)                         # [l, .., t]
    P = msm_mod.tree_reduce_leading(G1, scaled)

    # C_i = k_i * a = (k_i * a_hat) * G2
    ka = jnp.asarray(fl.ints_to_limbs(
        [x * a_hat % bn254.R for x in k_ints], FR.nlimbs))    # [L, l]
    C = G2.scalar_mul(g2_generator((l,)), ka)
    a = G2.scalar_mul(g2_generator(),
                      jnp.asarray(fl.int_to_limbs(a_hat, FR.nlimbs)[:, None]))
    return SubspaceKey(P=P, C=C, a=a)


def keygen_scalar(sM_mont, seed: int = 0) -> SubspaceKey:
    """Fast keygen from the Fr mirror of the relation matrix
    (`subspace.cc:45-65` scalar path): sM [l, L, t] Montgomery scalars
    such that M = sM * G. P = (k^T sM) * G via one field contraction +
    one fixed-base batch exponentiation."""
    from ..curve.group import g1_generator
    l = sM_mont.shape[0]
    t = sM_mont.shape[-1]
    rng = np.random.default_rng(seed ^ 0x5AB5)
    k_ints = lrand.rand_fr_ints(rng, l)
    a_hat = lrand.rand_fr_int(rng)

    k_mont = jnp.asarray(FR.to_mont_ints(k_ints))             # [L, l]
    k_rows = jnp.moveaxis(k_mont, -1, 0)[..., None]           # [l, L, 1]
    # field contraction p_j = sum_i k_i * sM[i, j]  (sparseinnerproduct)
    prod = fl.mont_mul(FR, sM_mont, k_rows)                   # [l, L, t]
    p_scal = mle.field_sum_leading(prod)                      # [L, t]

    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    P = msm_mod.batch_scalar_mul(G1, table,
                                 fl.from_mont(FR, p_scal), c=8)

    ka = jnp.asarray(fl.ints_to_limbs(
        [x * a_hat % bn254.R for x in k_ints], FR.nlimbs))
    C = G2.scalar_mul(g2_generator((l,)), ka)
    a = G2.scalar_mul(g2_generator(),
                      jnp.asarray(fl.int_to_limbs(a_hat, FR.nlimbs)[:, None]))
    return SubspaceKey(P=P, C=C, a=a)


def keygen_scalar_sparse(sM, seed: int = 0) -> SubspaceKey:
    """Scalar fast keygen on a SPARSE relation (`subspace.cc:45-65`
    driven by `sparseinnerproduct`, `sparsemexp.cc:26-33`): sM is a
    utils.sparse.SparseMatrix (col-major, Montgomery values, row
    positions into k). P_j = <k, sM[:, j]> costs nnz muls per column
    instead of l — the linking relation has 2 nonzeros per column out
    of l rows."""
    from ..utils import sparse as sp
    l = sM.nrows
    t = sM.values.shape[0]
    rng = np.random.default_rng(seed ^ 0x5AB5)
    k_ints = lrand.rand_fr_ints(rng, l)
    a_hat = lrand.rand_fr_int(rng)

    k_mont = jnp.asarray(FR.to_mont_ints(k_ints))             # [L, l]
    # vmapped sparse inner product over columns -> [t, L, 1]
    cols = jax.vmap(
        lambda v, p: sp.sparse_inner_product(k_mont, sp.SparseVec(v, p)))(
        sM.values, sM.positions)
    p_scal = jnp.moveaxis(cols[..., 0], 0, -1)                # [L, t]

    from ..curve.group import g1_generator
    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    P = msm_mod.batch_scalar_mul(G1, table,
                                 fl.from_mont(FR, p_scal), c=8)

    ka = jnp.asarray(fl.ints_to_limbs(
        [x * a_hat % bn254.R for x in k_ints], FR.nlimbs))
    C = G2.scalar_mul(g2_generator((l,)), ka)
    a = G2.scalar_mul(g2_generator(),
                      jnp.asarray(fl.int_to_limbs(a_hat, FR.nlimbs)[:, None]))
    return SubspaceKey(P=P, C=C, a=a)


def prove(key: SubspaceKey, w_mont) -> Point:
    """pi = <P, w> — the single hot MSM (`subspace.cc:78-85`)."""
    return msm_mod.msm(G1, key.P, fl.from_mont(FR, w_mont))


def verify(key: SubspaceKey, x: Point, pi: Point):
    """prod_i e(x_i, C_i) * e(-pi, a) == 1 (`subspace.cc:106-133`).
    x: [.., L, l] commitment points on the vector axis."""
    from ..curve import pairing as pr
    g1s = pr.point_concat([x, G1.neg(pi)])
    g2s = pr.point_concat([key.C, key.a])
    return pr.pairing_product_is_one(g1s, g2s)


# ---------------------------------------------------------------------------
# Linking-relation builder (the cplink example shape)
# ---------------------------------------------------------------------------


def make_linking_relation(h: Point, f: Point, bases_h: Point,
                          bases_f: Point) -> Point:
    """Build the 2 x (2 + N) relation of `examples/cplink.cc:17-41`:

        [ h  0  g_1 ... g_N ]
        [ 0  f  f_1 ... f_N ]

    witness w = (r_h, r_f, u_1..u_N); x = (c_H, c_F) the two
    commitments to the same u under base sets (g_i), (f_i).
    Rows stack on a LEADING axis; entries ride the vector axis.
    """
    from ..curve import pairing as pr
    idg = G1.identity(())
    row0 = pr.point_concat([h, idg, bases_h])
    row1 = pr.point_concat([idg, f, bases_f])
    from ..curve.group import point_stack
    return point_stack([row0, row1])
