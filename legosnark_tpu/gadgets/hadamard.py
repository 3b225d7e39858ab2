"""CPhad — Hadamard-product CP-SNARK (sumcheck-based).

TPU-native, sound re-design of `CPHad`
(`/root/reference/src/gadgets/hadamardsc.{h,cc}`). Relation: c = a ⊙ b
for committed n-vectors (d = log n variable MLEs).

Protocol (`hadamardsc.cc:54-131`):
  1. challenge rho in Fr^d
  2. CPpoly-open committed c~ at rho -> claimed sum t
  3. CPsc proof that t = sum_p eq(rho, p) * a~(p) * b~(p), with CPpoly
     openings of the ORIGINAL a, b at the sumcheck challenges and the
     closed-form beta factor checked by the verifier
     (`mle.cc:32-39` / prototools.mle.eval_beta_point).

Default mode is non-interactive Fiat-Shamir (`prove_fs`/`verify_fs`):
rho is squeezed after absorbing the three input commitments, matching
SURVEY §7 step 5 ("ship both, default sound"). The honest-verifier
`prove`/`verify` keep the reference's injectable-challenge shape.

Layout: vectors [L, n]; challenge lists [L, d] (see fields/limb.py).
"""
from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1
from ..prototools import mle
from ..utils import rand as lrand
from ..utils.transcript import Transcript
from . import poly as cppoly, sumcheck as cpsc

FR = bn254.FR


class HadKey(NamedTuple):
    n: int
    d: int
    poly_key: Any


class HadProof(NamedTuple):
    rho: Any              # [L, d]
    t_ans_comm: Point     # CPpoly answer commitment for c~(rho)
    c_poly_pf: Any        # CPpoly proof for c
    sc_proof: Any         # SumcheckProof


def proof_size_group_elements(key: "HadKey") -> dict:
    """`HadPf` size parity (`hadamardsc.h:32-45`)."""
    sc = cpsc.proof_size_group_elements(key.d, 3)
    return {"g1": sc["g1"] + 1 + 2 * key.d, "g2": sc["g2"],
            "fr": sc["fr"] + key.d}


def keygen(n: int, seed: int = 0) -> HadKey:
    d = int(n).bit_length() - 1
    assert 1 << d == n
    return HadKey(n, d, cppoly.keygen(d, seed))


def keygen_cached(n: int, seed: int = 0) -> HadKey:
    """`keygen` through the PST13 SRS disk cache."""
    d = int(n).bit_length() - 1
    assert 1 << d == n
    return HadKey(n, d, cppoly.keygen_cached(d, seed))


def commit_vec(key: HadKey, v_mont) -> cppoly.PolyComm:
    return cppoly.commit(key.poly_key, v_mont)


def commit_vec_staged(key: HadKey, v_mont) -> cppoly.PolyComm:
    return cppoly.commit_staged(key.poly_key, v_mont)


def make_nonces(d: int, seed: int = 0) -> dict:
    """Prover sigma nonces (uniform 254-bit)."""
    rng = np.random.default_rng(seed ^ 0xA0CE5)
    return {"eq_k": lrand.rand_fr_mont(rng, d),
            "prd_b": lrand.rand_fr_mont(rng, 5)}


def prove(key: HadKey, a_mont, b_mont, c_mont, rho_mont, challenges,
          sigma_rand) -> HadProof:
    """Honest-verifier mode (`CPHad::prove`, `hadamardsc.cc:54-98`):
    rho, challenges and sigma challenges are injected."""
    t, t_comm = cppoly.compute_answer(key.poly_key, c_mont, rho_mont)
    c_pf = cppoly.prove(key.poly_key, c_mont, rho_mont)

    beta = mle.mk_beta(rho_mont)
    sc_pf, _ = cpsc.prove(
        key.poly_key, jnp.stack([a_mont, b_mont]), sigma_rand,
        beta_table=beta, challenges=challenges)
    return HadProof(rho=rho_mont, t_ans_comm=t_comm, c_poly_pf=c_pf,
                    sc_proof=sc_pf)


def verify(key: HadKey, a_comm, b_comm, c_comm, proof: HadProof,
           sigma_rand):
    """Honest-verifier mode (`CPHad::verify`, `hadamardsc.cc:101-131`)."""
    c_ok = jnp.logical_and(
        cppoly.check_commit(key.poly_key, c_comm),
        cppoly.verify(key.poly_key, c_comm, proof.t_ans_comm,
                      proof.rho, proof.c_poly_pf))
    sc_ok = cpsc.verify(
        key.poly_key, proof.t_ans_comm, (a_comm, b_comm),
        proof.sc_proof, rand=sigma_rand,
        beta_point_fn=lambda r: mle.eval_beta_point(proof.rho, r))
    return jnp.logical_and(jnp.all(c_ok), jnp.all(sc_ok))


# --- staged honest-verifier path (per-shape-jitted, for large n) -----

_beta_jit = jax.jit(lambda rho: mle.mk_beta(rho))
_beta_pt_jit = jax.jit(lambda rho, r: mle.eval_beta_point(rho, r))
_stack_jit = jax.jit(lambda a, b: jnp.stack([a, b]))


def prove_staged(key: HadKey, a_mont, b_mont, c_mont, rho_mont,
                 challenges, sigma_rand) -> HadProof:
    """`prove` semantics through the bucketed CPpoly/sumcheck path
    (call OUTSIDE jit; honest-verifier mode)."""
    t, t_comm = cppoly.compute_answer_staged(key.poly_key, c_mont, rho_mont)
    c_pf = cppoly.prove_staged(key.poly_key, c_mont, rho_mont)
    sc_pf, _ = cpsc.prove(
        key.poly_key, _stack_jit(a_mont, b_mont), sigma_rand,
        beta_table=_beta_jit(rho_mont), challenges=challenges, staged=True)
    return HadProof(rho=rho_mont, t_ans_comm=t_comm, c_poly_pf=c_pf,
                    sc_proof=sc_pf)


def verify_staged(key: HadKey, a_comm, b_comm, c_comm, proof: HadProof,
                  sigma_rand):
    c_ok = jnp.logical_and(
        cppoly.check_commit_staged(key.poly_key, c_comm),
        cppoly.verify_staged(key.poly_key, c_comm, proof.t_ans_comm,
                             proof.rho, proof.c_poly_pf))
    sc_ok = cpsc.verify(
        key.poly_key, proof.t_ans_comm, (a_comm, b_comm),
        proof.sc_proof, rand=sigma_rand,
        beta_point_fn=lambda r: _beta_pt_jit(proof.rho, r), staged=True)
    return jnp.logical_and(jnp.all(c_ok), jnp.all(sc_ok))


def _seed_transcript(key: HadKey, a_comm, b_comm, c_comm) -> Transcript:
    tr = Transcript(label=0x4841444D)  # "HADM"
    for cm in (a_comm, b_comm, c_comm):
        tr.absorb_point(cm.c)
        tr.absorb_point(cm.ca)
    return tr


def prove_fs(key: HadKey, a_mont, b_mont, c_mont, a_comm, b_comm, c_comm,
             nonces=None) -> HadProof:
    """Non-interactive (Fiat-Shamir) mode — the DEFAULT. rho comes from
    the transcript after absorbing the input commitments; all sumcheck
    round and sigma challenges are transcript-derived."""
    if nonces is None:
        nonces = make_nonces(key.d)
    tr = _seed_transcript(key, a_comm, b_comm, c_comm)
    rho = tr.challenges(key.d)

    t, t_comm = cppoly.compute_answer(key.poly_key, c_mont, rho)
    c_pf = cppoly.prove(key.poly_key, c_mont, rho)
    tr.absorb_point(t_comm)

    beta = mle.mk_beta(rho)
    sc_pf, _ = cpsc.prove(
        key.poly_key, jnp.stack([a_mont, b_mont]), nonces,
        beta_table=beta, transcript=tr)
    return HadProof(rho=rho, t_ans_comm=t_comm, c_poly_pf=c_pf,
                    sc_proof=sc_pf)


def verify_fs(key: HadKey, a_comm, b_comm, c_comm, proof: HadProof):
    """Fiat-Shamir verify: rho and every later challenge are recomputed
    from the absorbed commitments; tampering anywhere breaks it."""
    tr = _seed_transcript(key, a_comm, b_comm, c_comm)
    rho = tr.challenges(key.d)
    tr.absorb_point(proof.t_ans_comm)

    c_ok = jnp.logical_and(
        cppoly.check_commit(key.poly_key, c_comm),
        cppoly.verify(key.poly_key, c_comm, proof.t_ans_comm,
                      rho, proof.c_poly_pf))
    sc_ok = cpsc.verify(
        key.poly_key, proof.t_ans_comm, (a_comm, b_comm),
        proof.sc_proof, transcript=tr,
        beta_point_fn=lambda r: mle.eval_beta_point(rho, r))
    return jnp.logical_and(jnp.all(c_ok), jnp.all(sc_ok))
