"""CPhadL (Lipmaa) round-trip + tamper tests.

Covers `/root/reference/src/gadgets/lipmaa.{h,cc}` (keygen/commit/
prove/verify + the commitment well-formedness pairing check), which had
zero pytest coverage in round 2.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.gadgets import lipmaa
from legosnark_tpu.utils import rand as lrand
pytestmark = pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host


R = bn254.R
FR = bn254.FR
rng = np.random.default_rng(31)


def to_mont(ints):
    return jnp.asarray(FR.to_mont_ints(ints))


@pytest.fixture(scope="module")
def setup():
    n = 8
    key = lipmaa.keygen(n, seed=9)
    a = lrand.rand_fr_ints(rng, n)
    b = lrand.rand_fr_ints(rng, n)
    c = [x * y % R for x, y in zip(a, b)]
    ds = lrand.rand_fr_mont(rng, 3)
    ca = lipmaa.commit(key.interp, to_mont(a), ds[..., 0:1])
    cb = lipmaa.commit(key.interp, to_mont(b), ds[..., 1:2])
    cc = lipmaa.commit(key.interp, to_mont(c), ds[..., 2:3])
    return key, a, b, c, ds, ca, cb, cc


def test_lipmaa_roundtrip(setup):
    key, a, b, c, ds, ca, cb, cc = setup
    pi = lipmaa.prove(key, to_mont(a), to_mont(b), to_mont(c), ds)
    assert bool(np.all(np.asarray(
        lipmaa.verify(key, ca, cb, cc, pi))))
    # commitment well-formedness
    for cm in (ca, cb, cc):
        assert bool(np.all(np.asarray(
            lipmaa.check_commit(key.interp, cm))))


def test_lipmaa_tamper_fails(setup):
    key, a, b, c, ds, ca, cb, cc = setup
    c_bad = list(c)
    c_bad[0] = (c_bad[0] + 1) % R
    cc_bad = lipmaa.commit(key.interp, to_mont(c_bad), ds[..., 2:3])
    pi = lipmaa.prove(key, to_mont(a), to_mont(b), to_mont(c), ds)
    # proof for the true c does not verify against the tampered c
    assert not bool(np.all(np.asarray(
        lipmaa.verify(key, ca, cb, cc_bad, pi))))
    # and a proof computed FOR the wrong c also fails (c != a*b)
    pi_bad = lipmaa.prove(key, to_mont(a), to_mont(b), to_mont(c_bad), ds)
    assert not bool(np.all(np.asarray(
        lipmaa.verify(key, ca, cb, cc_bad, pi_bad))))


def test_interp_commit_mismatched_kc_fails(setup):
    key, a, b, c, ds, ca, cb, cc = setup
    # swap the knowledge leg of ca with cb's: well-formedness must fail
    mixed = lipmaa.InterpComm(ca.c, cb.kc)
    assert not bool(np.all(np.asarray(
        lipmaa.check_commit(key.interp, mixed))))
