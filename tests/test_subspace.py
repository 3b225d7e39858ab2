"""Subspace QA-NIZK (CPlink) round-trip + tamper tests at a small N.

Covers `/root/reference/src/gadgets/subspace.{h,cc}` (both the dense
and scalar fast keygen paths) and the cplink linking relation
(`/root/reference/src/examples/cplink.cc:17-41`), which had zero
pytest coverage in round 2.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import Point, G1, g1_generator
from legosnark_tpu.curve import msm as msm_mod
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.gadgets import subspace
from legosnark_tpu.utils import rand as lrand
pytestmark = pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host


R = bn254.R
FR = bn254.FR
rng = np.random.default_rng(41)


@pytest.fixture(scope="module")
def linking():
    """Small cplink setup: bases, commitments, relation, witness."""
    n = 4
    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    exp_ints = lrand.rand_fr_ints(rng, 2 * n + 2)
    exps = jnp.asarray(fl.ints_to_limbs(exp_ints, FR.nlimbs))
    pts = msm_mod.batch_scalar_mul(G1, table, exps, c=8)
    sl = lambda a, b: Point(*(x[..., a:b] for x in pts))
    h, f = sl(0, 1), sl(1, 2)
    bases_h, bases_f = sl(2, n + 2), sl(n + 2, 2 * n + 2)

    u_ints = lrand.rand_fr_ints(rng, n)
    u = jnp.asarray(fl.ints_to_limbs(u_ints, FR.nlimbs))
    rH_i, rF_i = lrand.rand_fr_int(rng), lrand.rand_fr_int(rng)
    rH = jnp.asarray(fl.int_to_limbs(rH_i, FR.nlimbs)[:, None])
    rF = jnp.asarray(fl.int_to_limbs(rF_i, FR.nlimbs)[:, None])
    cH = G1.add(msm_mod.msm(G1, bases_h, u, c=4), G1.scalar_mul(h, rH))
    cF = G1.add(msm_mod.msm(G1, bases_f, u, c=4), G1.scalar_mul(f, rF))

    M = subspace.make_linking_relation(h, f, bases_h, bases_f)
    w = jnp.concatenate(
        [fl.to_mont(FR, rH), fl.to_mont(FR, rF), fl.to_mont(FR, u)],
        axis=-1)
    x = Point(*(jnp.concatenate([a, b], axis=-1) for a, b in zip(cH, cF)))
    sM = np.stack([
        FR.to_mont_ints([exp_ints[0], 0] + exp_ints[2 : n + 2]),
        FR.to_mont_ints([0, exp_ints[1]] + exp_ints[n + 2 :]),
    ])
    return M, jnp.asarray(sM), w, x, cH, cF


def test_subspace_roundtrip_dense(linking):
    M, sM, w, x, cH, cF = linking
    key = subspace.keygen(M, seed=3)
    pi = subspace.prove(key, w)
    assert bool(np.all(np.asarray(subspace.verify(key, x, pi))))

    # tampered statement: cH twice instead of (cH, cF) must fail
    x_bad = Point(*(jnp.concatenate([a, a], axis=-1) for a in cH))
    assert not bool(np.all(np.asarray(subspace.verify(key, x_bad, pi))))


def test_subspace_scalar_keygen_matches(linking):
    """The scalar fast path must produce a key that verifies the same
    statements (`subspace.cc:45-65`)."""
    M, sM, w, x, cH, cF = linking
    key = subspace.keygen_scalar(sM, seed=3)
    pi = subspace.prove(key, w)
    assert bool(np.all(np.asarray(subspace.verify(key, x, pi))))

    # tampered proof must fail
    pi_bad = G1.double(pi)
    assert not bool(np.all(np.asarray(subspace.verify(key, x, pi_bad))))


def test_subspace_wrong_witness_fails(linking):
    M, sM, w, x, cH, cF = linking
    key = subspace.keygen(M, seed=5)
    w_bad = fl.add(FR, w, fl.one(FR))
    pi_bad = subspace.prove(key, w_bad)
    assert not bool(np.all(np.asarray(subspace.verify(key, x, pi_bad))))
