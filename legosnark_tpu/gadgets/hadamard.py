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
"""
from __future__ import annotations

from typing import NamedTuple, Any

import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1
from ..prototools import mle
from . import poly as cppoly, sumcheck as cpsc

FR = bn254.FR


class HadKey(NamedTuple):
    n: int
    d: int
    poly_key: Any


class HadProof(NamedTuple):
    rho: Any              # [d, L]
    t_ans_comm: Point     # CPpoly answer commitment for c~(rho)
    c_poly_pf: Any        # CPpoly proof for c
    sc_proof: Any         # SumcheckProof


def keygen(n: int, seed: int = 0) -> HadKey:
    d = int(n).bit_length() - 1
    assert 1 << d == n
    return HadKey(n, d, cppoly.keygen(d, seed))


def commit_vec(key: HadKey, v_mont) -> cppoly.PolyComm:
    return cppoly.commit(key.poly_key, v_mont)


def prove(key: HadKey, a_mont, b_mont, c_mont, rho_mont, challenges,
          sigma_rand) -> HadProof:
    """`CPHad::prove` (`hadamardsc.cc:54-98`)."""
    t, t_comm = cppoly.compute_answer(key.poly_key, c_mont, rho_mont)
    c_pf = cppoly.prove(key.poly_key, c_mont, rho_mont)

    beta = mle.mk_beta(rho_mont)
    sc_pf, _ = cpsc.prove(
        key.poly_key, jnp.stack([a_mont, b_mont]), challenges,
        sigma_rand, beta_table=beta)
    return HadProof(rho=rho_mont, t_ans_comm=t_comm, c_poly_pf=c_pf,
                    sc_proof=sc_pf)


def verify(key: HadKey, a_comm, b_comm, c_comm, proof: HadProof,
           sigma_rand):
    """`CPHad::verify` (`hadamardsc.cc:101-131`)."""
    c_ok = jnp.logical_and(
        cppoly.check_commit(key.poly_key, c_comm),
        cppoly.verify(key.poly_key, c_comm, proof.t_ans_comm,
                      proof.rho, proof.c_poly_pf))
    sc_ok = cpsc.verify(
        key.poly_key, proof.t_ans_comm, (a_comm, b_comm),
        proof.sc_proof, sigma_rand,
        beta_point_fn=lambda r: mle.eval_beta_point(proof.rho, r))
    return jnp.logical_and(c_ok, sc_ok)
