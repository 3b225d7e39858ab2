"""Device pairing vs the bigint oracle.

Validates the TPU replacements for libff `miller_loop` /
`final_exponentiation` (`/root/reference/src/utils/globl.h:94-105`).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracle
from legosnark_tpu.curve import bn254, pairing as pr
from legosnark_tpu.curve.group import (

    G1, Point, g1_from_oracle, g2_from_oracle,
)
pytestmark = pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host

rng = np.random.default_rng(11)


def f12_to_oracle(a):
    """Single device Fq12 [2, 3, 2, L] (no vector axis) -> oracle ints."""
    a = np.asarray(a)
    spec = bn254.FQ

    def f2(v):
        return (spec.from_mont_limbs(v[0]), spec.from_mont_limbs(v[1]))

    return tuple(
        tuple(f2(a[j, i]) for i in range(3)) for j in range(2)
    )


def setup_pairs(n):
    ks1 = [int(rng.integers(1, 1 << 50)) for _ in range(n)]
    ks2 = [int(rng.integers(1, 1 << 50)) for _ in range(n)]
    ps = [oracle.g1_mul(oracle.G1, k) for k in ks1]
    qs = [oracle.g2_mul(oracle.G2, k) for k in ks2]
    return ps, qs


def test_miller_and_pairing_match_oracle():
    # 2 real pairs padded to the production 4-lane width so this test
    # exercises (and pre-warms) the SAME compiled miller/final-exp
    # graphs every eager verifier uses (pairing.miller_jit /
    # final_exp_jit — see the decomposition note in curve/pairing.py)
    ps, qs = setup_pairs(2)
    p_dev = g1_from_oracle(ps + ps)
    q_dev = g2_from_oracle(qs + qs)

    px, py, _ = pr._g1aff_jit(p_dev)
    qx, qy, _ = pr._g2aff_jit(q_dev)

    ml = pr.miller_jit(px, py, qx, qy)

    for i in range(2):
        exp_ml = oracle.miller_loop(
            oracle.untwist(qs[i]),
            (oracle.f12_from_fq(ps[i][0]), oracle.f12_from_fq(ps[i][1])))
        assert f12_to_oracle(ml[..., i]) == exp_ml
        full_i = pr.final_exp_jit(ml[..., i : i + 1])
        assert f12_to_oracle(full_i[..., 0]) == oracle.final_exp(exp_ml)


def test_pairing_bilinearity_on_device():
    ps, qs = setup_pairs(1)
    p, q = ps[0], qs[0]
    p2 = oracle.g1_mul(p, 2)
    q2 = oracle.g2_mul(q, 2)

    p_dev = g1_from_oracle([p, p2, p, p])
    q_dev = g2_from_oracle([q, q, q2, q])
    px, py, _ = pr._g1aff_jit(p_dev)
    qx, qy, _ = pr._g2aff_jit(q_dev)
    ml = pr.miller_jit(px, py, qx, qy)
    e = [pr.final_exp_jit(ml[..., i : i + 1])[..., 0] for i in range(3)]

    e_pq, e_2pq, e_p2q = (f12_to_oracle(e[i]) for i in range(3))
    sq = oracle.f12_mul(e_pq, e_pq)
    assert e_2pq == sq
    assert e_p2q == sq


def test_simple_pairing_check():
    # e(2P, Q) == e(P, 2Q) must hold; e(2P, Q) == e(P, 3Q) must not.
    ps, qs = setup_pairs(1)
    p, q = ps[0], qs[0]
    a1 = g1_from_oracle([oracle.g1_mul(p, 2)])
    a2 = g2_from_oracle([q])
    b1 = g1_from_oracle([p])
    b2_good = g2_from_oracle([oracle.g2_mul(q, 2)])
    b2_bad = g2_from_oracle([oracle.g2_mul(q, 3)])

    # EAGER: routes through the decomposed shared pairing graphs
    assert bool(pr.simple_pairing_check(a1, a2, b1, b2_good))
    assert not bool(pr.simple_pairing_check(a1, a2, b1, b2_bad))


def test_pairing_with_identity_masked():
    # product over [e(P,Q), e(identity, Q)] == e(P,Q): identity leg drops out
    ps, qs = setup_pairs(1)
    p, q = ps[0], qs[0]
    p_dev = g1_from_oracle([p, None, oracle.g1_neg(p)])
    q_dev = g2_from_oracle([q, q, q])
    assert bool(pr.pairing_product_is_one(p_dev, q_dev))
