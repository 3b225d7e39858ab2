"""CPmmp — matrix-multiplication CP-SNARK (the paper benchmark).

TPU-native, sound re-design of `CPMat`
(`/root/reference/src/gadgets/matrixsc.{h,cc}`). Relation: C = A*B for
n x n matrices committed as n^2-entry MLEs (2d variables, d = log n).

Protocol (Thaler matmul sumcheck, the shape `matrixsc.cc:55-152` has):
  1. challenges r, s in Fr^d  (the reference samples both but folds
     both matrices by r — `matrixsc.cc:75-80` + `sumcheck.h:126-130`;
     here the folds are the mathematically correct ones)
  2. t = C~(col=s, row=r); in-clear mode the verifier recomputes it
     from the public C (`matrixsc.cc:156-184`), otherwise a CPpoly
     opening of committed C proves it (`matrixsc.cc:85-95`)
  3. sumcheck over d variables on tables
        ta[p] = A~(row=r, col=p)   (matrix_mle_fold by eq(.,r) — the
                                    `DPMatrixMle` collapse, `mle.h:237-262`)
        tb[p] = B~(row=p, col=s)
     proving t = sum_p ta[p] * tb[p]
  4. CPpoly openings of the ORIGINAL A at (rho'||r) and B at (s||rho')
     bind the sumcheck finals to the committed matrices.

Matrix layout: tables are flattened row-major (index = col + n*row),
so variables 0..d-1 are column bits and d..2d-1 row bits, matching the
`A[l||r]` convention of the reference.
"""
from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, FR_OPS
from ..prototools import mle
from . import poly as cppoly, sumcheck as cpsc

FR = bn254.FR


class MatKey(NamedTuple):
    n: int
    d: int                  # log2 n
    poly_key: Any           # PolyKey with 2d variables (for A, B, C)
    poly_key_half: Any      # PolyKey with d variables (sumcheck opens use
                            # suffix levels of poly_key; kept for clarity)


class MatProof(NamedTuple):
    r: Any                  # [d, L] row challenges
    s: Any                  # [d, L] col challenges
    t_comm: Point           # commitment to the claimed product eval
    sc_proof: Any           # SumcheckProof
    c_ans_comm: Point       # CPpoly answer commitment for C (committed mode)
    c_poly_pf: Any          # CPpoly proof for C (committed mode) or None


def keygen(n: int, seed: int = 0) -> MatKey:
    """d_sc = log(n) = log(n^2)/2, cf. `matrixsc.cc:45-53`."""
    d = int(n).bit_length() - 1
    assert 1 << d == n, "n must be a power of two"
    pk = cppoly.keygen(2 * d, seed)
    return MatKey(n, d, pk, None)


def commit_matrix(key: MatKey, M_mont) -> cppoly.PolyComm:
    """Commit an [n, n, L] matrix as its flattened 2d-variable MLE."""
    return cppoly.commit(key.poly_key, M_mont.reshape(-1, FR.nlimbs))


def _fold_tables(A_mont, B_mont, r_mont, s_mont):
    beta_r = mle.mk_beta(r_mont)
    beta_s = mle.mk_beta(s_mont)
    ta = mle.matrix_mle_fold(A_mont, beta_r)          # A~(r, .) over cols
    tb = mle.matrix_mle_fold(
        jnp.swapaxes(B_mont, 0, 1), beta_s)           # B~(., s) over rows
    return ta, tb


def prove_output_in_clear(key: MatKey, A_mont, B_mont, C_mont,
                          r_mont, s_mont, challenges, sigma_rand
                          ) -> MatProof:
    """`proveOutputMatrixInClear` (`matrixsc.cc:106-152`): C is public,
    no CPpoly proof for it. challenges: [d, L] sumcheck rounds."""
    d = key.d
    ta, tb = _fold_tables(A_mont, B_mont, r_mont, s_mont)
    tables = jnp.stack([ta, tb])

    # CPpoly open-points for the ORIGINAL matrices (col vars first)
    a_point = jnp.concatenate([challenges, r_mont], axis=0)
    b_point = jnp.concatenate([s_mont, challenges], axis=0)
    a_flat = A_mont.reshape(-1, FR.nlimbs)
    b_flat = B_mont.reshape(-1, FR.nlimbs)

    sc_pf, z0 = cpsc.prove(
        key.poly_key, tables, challenges, sigma_rand,
        beta_table=None,
        open_points=(a_point, b_point),
        open_tables=(a_flat, b_flat))

    t_comm = cpsc.commit_scalar(key.poly_key.g1, z0)
    return MatProof(r=r_mont, s=s_mont, t_comm=t_comm, sc_proof=sc_pf,
                    c_ans_comm=t_comm, c_poly_pf=None)


def verify_output_in_clear(key: MatKey, a_comm, b_comm, C_mont,
                           proof: MatProof, sigma_rand):
    """`verifyOutputMatrixInClear` (`matrixsc.cc:156-184`): the
    verifier evaluates the public output MLE itself — O(n^2) field ops
    — and requires the sumcheck to be rooted at exactly that value."""
    d = key.d
    rs_point = jnp.concatenate([proof.s, proof.r], axis=0)
    t = mle.eval_mle(C_mont.reshape(-1, FR.nlimbs), rs_point)
    t_comm = cpsc.commit_scalar(key.poly_key.g1, t)
    root_ok = G1.eq(t_comm, proof.t_comm)

    a_point = jnp.concatenate([proof.sc_proof.r, proof.r], axis=0)
    b_point = jnp.concatenate([proof.s, proof.sc_proof.r], axis=0)
    sc_ok = cpsc.verify(
        key.poly_key, t_comm, (a_comm, b_comm), proof.sc_proof,
        sigma_rand, beta_point_fn=None,
        open_points=(a_point, b_point))
    return jnp.logical_and(root_ok, sc_ok)


def prove(key: MatKey, A_mont, B_mont, C_mont, r_mont, s_mont,
          challenges, sigma_rand) -> MatProof:
    """Committed-output variant (`matrixsc.cc:55-104`): additionally
    CPpoly-opens committed C at (s||r)."""
    base = prove_output_in_clear(
        key, A_mont, B_mont, C_mont, r_mont, s_mont, challenges,
        sigma_rand)
    c_flat = C_mont.reshape(-1, FR.nlimbs)
    rs_point = jnp.concatenate([s_mont, r_mont], axis=0)
    t, t_ans_comm = cppoly.compute_answer(key.poly_key, c_flat, rs_point)
    c_pf = cppoly.prove(key.poly_key, c_flat, rs_point)
    return base._replace(c_ans_comm=t_ans_comm, c_poly_pf=c_pf)


def verify(key: MatKey, a_comm, b_comm, c_comm, proof: MatProof,
           sigma_rand):
    """Committed-output verify (`matrixsc.cc:188-218`)."""
    rs_point = jnp.concatenate([proof.s, proof.r], axis=0)
    c_ok = jnp.logical_and(
        cppoly.check_commit(key.poly_key, c_comm),
        cppoly.verify(key.poly_key, c_comm, proof.c_ans_comm, rs_point,
                      proof.c_poly_pf))
    a_point = jnp.concatenate([proof.sc_proof.r, proof.r], axis=0)
    b_point = jnp.concatenate([proof.s, proof.sc_proof.r], axis=0)
    sc_ok = cpsc.verify(
        key.poly_key, proof.c_ans_comm, (a_comm, b_comm), proof.sc_proof,
        sigma_rand, beta_point_fn=None,
        open_points=(a_point, b_point))
    return jnp.logical_and(c_ok, sc_ok)
