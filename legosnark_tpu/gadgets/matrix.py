"""CPmmp — matrix-multiplication CP-SNARK (the paper benchmark).

TPU-native, sound re-design of `CPMat`
(`/root/reference/src/gadgets/matrixsc.{h,cc}`). Relation: C = A*B for
n x n matrices committed as n^2-entry MLEs (2d variables, d = log n).

Protocol (Thaler matmul sumcheck, the shape `matrixsc.cc:55-152` has):
  1. challenges r, s in Fr^d  (the reference samples both but folds
     both matrices by r — `matrixsc.cc:75-80` + `sumcheck.h:126-130`;
     here the folds are the mathematically correct ones)
  2. t = C~(row=r, col=s); in-clear mode the verifier recomputes it
     from the public C (`matrixsc.cc:156-184`), otherwise a CPpoly
     opening of committed C proves it (`matrixsc.cc:85-95`)
  3. sumcheck over d variables on tables
        ta[p] = A~(row=r, col=p)   (matrix_mle_fold by eq(.,r) — the
                                    `DPMatrixMle` collapse, `mle.h:237-262`)
        tb[p] = B~(row=p, col=s)
     proving t = sum_p ta[p] * tb[p]
  4. CPpoly openings of the ORIGINAL A at (r||rho') and B at (rho'||s)
     bind the sumcheck finals to the committed matrices.

Matrix layout: matrices are [n, L, n] (rows leading, columns on the
vector axis); the flattened MLE index is row*n + col. With the
framework's BIG-endian variable convention (prototools.mle), the ROW
bits are variables 0..d-1 and the column bits d..2d-1, so evaluation
points concatenate as (row point || col point) — note the reference's
little-endian `A[l||r]` convention maps to the same flattening.

Default mode is Fiat-Shamir (`prove_*_fs`/`verify_*_fs`): r, s come
from the transcript after absorbing the input commitments.
"""
from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, FR_OPS
from ..prototools import mle
from ..utils import rand as lrand
from ..utils.transcript import Transcript
from . import poly as cppoly, sumcheck as cpsc

FR = bn254.FR


class MatKey(NamedTuple):
    n: int
    d: int                  # log2 n
    poly_key: Any           # PolyKey with 2d variables (for A, B, C)


class MatProof(NamedTuple):
    r: Any                  # [L, d] row challenges
    s: Any                  # [L, d] col challenges
    t_comm: Point           # commitment to the claimed product eval
    sc_proof: Any           # SumcheckProof
    c_ans_comm: Point       # CPpoly answer commitment for C (committed mode)
    c_poly_pf: Any          # CPpoly proof for C (committed mode) or None


def proof_size_group_elements(key: "MatKey") -> dict:
    """`MatPf::getSize` parity (`matrixsc.h:44-50`)."""
    sc = cpsc.proof_size_group_elements(key.d, 2)
    return {"g1": sc["g1"] + 2 + 2 * 2 * key.d, "g2": sc["g2"],
            "fr": sc["fr"] + 2 * key.d}


def keygen(n: int, seed: int = 0) -> MatKey:
    """d_sc = log(n) = log(n^2)/2, cf. `matrixsc.cc:45-53`."""
    d = int(n).bit_length() - 1
    assert 1 << d == n, "n must be a power of two"
    pk = cppoly.keygen(2 * d, seed)
    return MatKey(n, d, pk)


def keygen_cached(n: int, seed: int = 0) -> MatKey:
    """`keygen` through the PST13 SRS disk cache (poly.keygen_cached)."""
    d = int(n).bit_length() - 1
    assert 1 << d == n, "n must be a power of two"
    return MatKey(n, d, cppoly.keygen_cached(2 * d, seed))


def flatten_matrix(M_mont):
    """[n, L, n] -> [L, n^2] row-major MLE table (index = row*n+col)."""
    n = M_mont.shape[0]
    return jnp.moveaxis(M_mont, 0, -2).reshape(
        M_mont.shape[1:-1] + (n * n,))


def commit_matrix(key: MatKey, M_mont) -> cppoly.PolyComm:
    """Commit an [n, L, n] matrix as its flattened 2d-variable MLE."""
    return cppoly.commit(key.poly_key, flatten_matrix(M_mont))


def prove_output_in_clear(key: MatKey, A_mont, B_mont, C_mont,
                          r_mont, s_mont, nonces, transcript=None,
                          challenges=None, hv_rand=None) -> MatProof:
    """`proveOutputMatrixInClear` (`matrixsc.cc:106-152`): C is public,
    no CPpoly proof for it."""
    beta_r = mle.mk_beta(r_mont)
    beta_s = mle.mk_beta(s_mont)
    ta = mle.matrix_mle_fold(A_mont, beta_r)
    tb = mle.matrix_mle_fold(_transpose(B_mont), beta_s)
    tables = jnp.stack([ta, tb])

    a_flat = flatten_matrix(A_mont)
    b_flat = flatten_matrix(B_mont)

    rand = dict(nonces)
    if hv_rand:
        rand.update(hv_rand)
    sc_pf, z0 = cpsc.prove(
        key.poly_key, tables, rand,
        beta_table=None,
        open_points_fn=lambda rho: (
            jnp.concatenate([r_mont, rho], axis=-1),    # A at (r || p)
            jnp.concatenate([rho, s_mont], axis=-1)),   # B at (p || s)
        open_tables=(a_flat, b_flat),
        challenges=challenges, transcript=transcript)

    t_comm = cpsc.commit_scalar(key.poly_key.g1, z0)
    return MatProof(r=r_mont, s=s_mont, t_comm=t_comm, sc_proof=sc_pf,
                    c_ans_comm=t_comm, c_poly_pf=None)


def eval_public_output(C_mont, r_mont, s_mont):
    """The verifier's O(n^2) public-output MLE evaluation
    (`matrixsc.cc:180`), exposed separately so large-n drivers can jit
    it apart from the pairing-check graph (one 2^2d eq-table build
    fused into the sumcheck verifier blows up compile memory)."""
    rs_point = jnp.concatenate([r_mont, s_mont], axis=-1)
    return mle.eval_mle(flatten_matrix(C_mont), rs_point)


def verify_output_in_clear(key: MatKey, a_comm, b_comm, C_mont,
                           proof: MatProof, r_mont=None, s_mont=None,
                           transcript=None, hv_rand=None, t_mont=None):
    """`verifyOutputMatrixInClear` (`matrixsc.cc:156-184`): the
    verifier evaluates the public output MLE itself — O(n^2) field ops
    — and requires the sumcheck to be rooted at exactly that value.
    Pass `t_mont` (from `eval_public_output`) to skip the internal
    evaluation."""
    r_mont = proof.r if r_mont is None else r_mont
    s_mont = proof.s if s_mont is None else s_mont
    t = t_mont if t_mont is not None else eval_public_output(
        C_mont, r_mont, s_mont)
    t_comm = cpsc.commit_scalar(key.poly_key.g1, t)
    root_ok = G1.eq(t_comm, proof.t_comm)

    sc_ok = cpsc.verify(
        key.poly_key, t_comm, (a_comm, b_comm), proof.sc_proof,
        rand=hv_rand, beta_point_fn=None,
        open_points_fn=lambda rho: (
            jnp.concatenate([r_mont, rho], axis=-1),
            jnp.concatenate([rho, s_mont], axis=-1)),
        transcript=transcript)
    return jnp.logical_and(jnp.all(root_ok), jnp.all(sc_ok))


def prove(key: MatKey, A_mont, B_mont, C_mont, r_mont, s_mont,
          nonces, transcript=None, challenges=None, hv_rand=None
          ) -> MatProof:
    """Committed-output variant (`matrixsc.cc:55-104`): additionally
    CPpoly-opens committed C at (r||s)."""
    base = prove_output_in_clear(
        key, A_mont, B_mont, C_mont, r_mont, s_mont, nonces,
        transcript=transcript, challenges=challenges, hv_rand=hv_rand)
    c_flat = flatten_matrix(C_mont)
    rs_point = jnp.concatenate([r_mont, s_mont], axis=-1)
    t, t_ans_comm = cppoly.compute_answer(key.poly_key, c_flat, rs_point)
    c_pf = cppoly.prove(key.poly_key, c_flat, rs_point)
    return base._replace(c_ans_comm=t_ans_comm, c_poly_pf=c_pf)


def verify(key: MatKey, a_comm, b_comm, c_comm, proof: MatProof,
           r_mont=None, s_mont=None, transcript=None, hv_rand=None):
    """Committed-output verify (`matrixsc.cc:188-218`)."""
    r_mont = proof.r if r_mont is None else r_mont
    s_mont = proof.s if s_mont is None else s_mont
    rs_point = jnp.concatenate([r_mont, s_mont], axis=-1)
    c_ok = jnp.logical_and(
        cppoly.check_commit(key.poly_key, c_comm),
        cppoly.verify(key.poly_key, c_comm, proof.c_ans_comm, rs_point,
                      proof.c_poly_pf))
    sc_ok = cpsc.verify(
        key.poly_key, proof.c_ans_comm, (a_comm, b_comm), proof.sc_proof,
        rand=hv_rand, beta_point_fn=None,
        open_points_fn=lambda rho: (
            jnp.concatenate([r_mont, rho], axis=-1),
            jnp.concatenate([rho, s_mont], axis=-1)),
        transcript=transcript)
    return jnp.logical_and(jnp.all(c_ok), jnp.all(sc_ok))


def _transpose(M):
    """[n, L, n] -> [n, L, n] matrix transpose (rows <-> cols),
    keeping the limb axis at -2."""
    return jnp.transpose(M, (2, 1, 0))


def make_nonces(d: int, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed ^ 0x3A7B)
    return {"eq_k": lrand.rand_fr_mont(rng, d),
            "prd_b": lrand.rand_fr_mont(rng, 5)}


# ---------------------------------------------------------------------------
# Staged (per-shape-jitted) honest-verifier path — the n=1024 bench route
# ---------------------------------------------------------------------------


@jax.jit
def _prep_tables(A_mont, B_mont, r_mont, s_mont):
    """Matrix folds + flattens in one compiled pass (the DPMatrixMle
    collapse, `mle.h:237-262`)."""
    ta = mle.matrix_mle_fold(A_mont, mle.mk_beta(r_mont))
    tb = mle.matrix_mle_fold(_transpose(B_mont), mle.mk_beta(s_mont))
    return (jnp.stack([ta, tb]), flatten_matrix(A_mont),
            flatten_matrix(B_mont))


_commit_scalar_jit = jax.jit(lambda g, v: cpsc.commit_scalar(g, v))
_open_pt_jit = jax.jit(
    lambda r, s, rho: (jnp.concatenate([r, rho], axis=-1),
                       jnp.concatenate([rho, s], axis=-1)))


_flatten_jit = jax.jit(lambda M: flatten_matrix(M))


def commit_matrix_staged(key: MatKey, M_mont) -> cppoly.PolyComm:
    return cppoly.commit_staged(key.poly_key, _flatten_jit(M_mont))


def prove_output_in_clear_staged(key: MatKey, A_mont, B_mont,
                                 r_mont, s_mont, nonces, challenges,
                                 hv_rand) -> MatProof:
    """`prove_output_in_clear` semantics through the staged sumcheck/
    CPpoly path — call OUTSIDE jit; the heavy MSMs reuse the bucketed
    `poly._pair_msm` shape cache. C is not needed (public output)."""
    tables, a_flat, b_flat = _prep_tables(A_mont, B_mont, r_mont, s_mont)
    rand = dict(nonces)
    rand.update(hv_rand)
    sc_pf, z0 = cpsc.prove(
        key.poly_key, tables, rand, beta_table=None,
        open_points_fn=lambda rho: _open_pt_jit(r_mont, s_mont, rho),
        open_tables=(a_flat, b_flat),
        challenges=challenges, staged=True)
    t_comm = _commit_scalar_jit(key.poly_key.g1, z0)
    return MatProof(r=r_mont, s=s_mont, t_comm=t_comm, sc_proof=sc_pf,
                    c_ans_comm=t_comm, c_poly_pf=None)


_eval_pub_jit = jax.jit(lambda C, r, s: eval_public_output(C, r, s))
_eq_jit = jax.jit(lambda a, b: jnp.all(G1.eq(a, b)))


def verify_output_in_clear_staged(key: MatKey, a_comm, b_comm, C_mont,
                                  proof: MatProof, hv_rand,
                                  t_mont=None):
    """`verify_output_in_clear` through the staged pieces: the O(n^2)
    public-output MLE eval, the round replay, and ONE compiled CPpoly
    ladder serving both commitments."""
    r_mont, s_mont = proof.r, proof.s
    t = t_mont if t_mont is not None else _eval_pub_jit(
        C_mont, r_mont, s_mont)
    t_comm = _commit_scalar_jit(key.poly_key.g1, t)
    root_ok = _eq_jit(t_comm, proof.t_comm)
    sc_ok = cpsc.verify(
        key.poly_key, t_comm, (a_comm, b_comm), proof.sc_proof,
        rand=hv_rand, beta_point_fn=None,
        open_points_fn=lambda rho: _open_pt_jit(r_mont, s_mont, rho),
        staged=True)
    return jnp.logical_and(jnp.all(root_ok), jnp.all(sc_ok))


# ---------------------------------------------------------------------------
# Fiat-Shamir (default) wrappers
# ---------------------------------------------------------------------------


def _seed_transcript(key: MatKey, a_comm, b_comm, extra=None) -> Transcript:
    tr = Transcript(label=0x4D4D5243)  # "MMRC"
    for cm in (a_comm, b_comm) + ((extra,) if extra is not None else ()):
        tr.absorb_point(cm.c)
        tr.absorb_point(cm.ca)
    return tr


def prove_output_in_clear_fs(key: MatKey, A_mont, B_mont, C_mont,
                             a_comm, b_comm, nonces=None) -> MatProof:
    if nonces is None:
        nonces = make_nonces(key.d)
    tr = _seed_transcript(key, a_comm, b_comm)
    tr.absorb_fr(flatten_matrix(C_mont))   # public output binds r, s
    r = tr.challenges(key.d)
    s = tr.challenges(key.d)
    return prove_output_in_clear(key, A_mont, B_mont, C_mont, r, s,
                                 nonces, transcript=tr)


def verify_output_in_clear_fs(key: MatKey, a_comm, b_comm, C_mont,
                              proof: MatProof):
    tr = _seed_transcript(key, a_comm, b_comm)
    tr.absorb_fr(flatten_matrix(C_mont))
    r = tr.challenges(key.d)
    s = tr.challenges(key.d)
    return verify_output_in_clear(key, a_comm, b_comm, C_mont, proof,
                                  r_mont=r, s_mont=s, transcript=tr)


def prove_fs(key: MatKey, A_mont, B_mont, C_mont, a_comm, b_comm,
             c_comm, nonces=None) -> MatProof:
    if nonces is None:
        nonces = make_nonces(key.d)
    tr = _seed_transcript(key, a_comm, b_comm, extra=c_comm)
    r = tr.challenges(key.d)
    s = tr.challenges(key.d)
    return prove(key, A_mont, B_mont, C_mont, r, s, nonces, transcript=tr)


def verify_fs(key: MatKey, a_comm, b_comm, c_comm, proof: MatProof):
    tr = _seed_transcript(key, a_comm, b_comm, extra=c_comm)
    r = tr.challenges(key.d)
    s = tr.challenges(key.d)
    return verify(key, a_comm, b_comm, c_comm, proof, r_mont=r, s_mont=s,
                  transcript=tr)
