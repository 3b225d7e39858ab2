"""Fiat-Shamir transcript + non-interactive gadget round-trips.

SURVEY §7 step 5 ("ship both, default sound"): the FS mode is the
default in CPhad/CPmmp; these tests check the non-interactive
round-trips succeed and that any transcript divergence (tampered
commitment, wrong absorb order) breaks verification.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.utils.transcript import Transcript
from legosnark_tpu.utils import rand as lrand
from legosnark_tpu.gadgets import hadamard as cphad, matrix as cpmat

R = bn254.R
FR = bn254.FR
rng = np.random.default_rng(51)


def to_mont(ints):
    return jnp.asarray(FR.to_mont_ints(ints))


def test_transcript_determinism_and_sensitivity():
    a = to_mont(lrand.rand_fr_ints(rng, 4))

    t1 = Transcript(label=7)
    t1.absorb_fr(a)
    c1 = t1.challenge()

    t2 = Transcript(label=7)
    t2.absorb_fr(a)
    c2 = t2.challenge()
    assert np.array_equal(np.asarray(c1), np.asarray(c2))

    # different label, different data, different order -> different out
    t3 = Transcript(label=8)
    t3.absorb_fr(a)
    assert not np.array_equal(np.asarray(t3.challenge()), np.asarray(c1))

    a_bad = fl.add(FR, a, fl.one(FR))
    t4 = Transcript(label=7)
    t4.absorb_fr(a_bad)
    assert not np.array_equal(np.asarray(t4.challenge()), np.asarray(c1))

    # challenges chain: a second squeeze differs from the first
    t5 = Transcript(label=7)
    t5.absorb_fr(a)
    cs = t5.challenges(2)
    assert not np.array_equal(np.asarray(cs[..., 0]), np.asarray(cs[..., 1]))


@pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host
def test_cphad_fs_roundtrip_and_tamper():
    n, d = 4, 2
    key = cphad.keygen(n, seed=6)
    a = lrand.rand_fr_ints(rng, n)
    b = lrand.rand_fr_ints(rng, n)
    c = [x * y % R for x, y in zip(a, b)]
    am, bm, cm_v = to_mont(a), to_mont(b), to_mont(c)

    a_cm = jax.jit(cphad.commit_vec)(key, am)
    b_cm = jax.jit(cphad.commit_vec)(key, bm)
    c_cm = jax.jit(cphad.commit_vec)(key, cm_v)

    pf = cphad.prove_fs(key, am, bm, cm_v, a_cm, b_cm, c_cm)
    assert bool(np.all(np.asarray(
        cphad.verify_fs(key, a_cm, b_cm, c_cm, pf))))

    # transcript mismatch: verifying against a different commitment set
    # (b in place of a) re-derives different challenges -> must fail
    assert not bool(np.all(np.asarray(
        cphad.verify_fs(key, b_cm, a_cm, c_cm, pf))))


@pytest.mark.slow
def test_cpmat_fs_in_clear_roundtrip():
    n, d = 4, 2
    key = cpmat.keygen(n, seed=7)
    A = [lrand.rand_fr_ints(rng, n) for _ in range(n)]
    B = [lrand.rand_fr_ints(rng, n) for _ in range(n)]
    C = [[sum(A[i][k] * B[k][j] for k in range(n)) % R for j in range(n)]
         for i in range(n)]
    stack = lambda M: jnp.asarray(
        np.stack([FR.to_mont_ints(row) for row in M]))
    Am, Bm, Cm = stack(A), stack(B), stack(C)

    a_cm = jax.jit(cpmat.commit_matrix)(key, Am)
    b_cm = jax.jit(cpmat.commit_matrix)(key, Bm)

    pf = cpmat.prove_output_in_clear_fs(key, Am, Bm, Cm, a_cm, b_cm)
    assert bool(np.all(np.asarray(
        cpmat.verify_output_in_clear_fs(key, a_cm, b_cm, Cm, pf))))

    # tampered public output -> challenges AND root check change
    C_bad = [row[:] for row in C]
    C_bad[0][0] = (C_bad[0][0] + 1) % R
    assert not bool(np.all(np.asarray(
        cpmat.verify_output_in_clear_fs(key, a_cm, b_cm, stack(C_bad),
                                        pf))))
