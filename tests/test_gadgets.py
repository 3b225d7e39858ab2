"""End-to-end gadget round-trips: CPpoly, CPsc/CPhad, CPmmp.

The reference has no tests (SURVEY §4); these are the self-checking
round-trips its examples imply (`/root/reference/src/examples/*.cc`),
plus tamper checks the reference never does. Fiat-Shamir round-trips
live in test_transcript_fs.py; the `slow` marker guards the most
pairing-heavy variants (deselect with `-m "not slow"`).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1, Point
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.prototools import mle
from legosnark_tpu.gadgets import (
    poly as cppoly, sigma, sumcheck as cpsc, matrix as cpmat,
    hadamard as cphad,
)

R = bn254.R
FR = bn254.FR
rng = np.random.default_rng(5)


def rand_ints(n):
    return [int(rng.integers(0, 1 << 63)) * int(rng.integers(0, 1 << 63))
            % R for _ in range(n)]


def to_mont(ints):
    """[L, n] Montgomery."""
    return jnp.asarray(FR.to_mont_ints(ints))


def mk_sigma_rand(d):
    return {
        "eq_k": to_mont(rand_ints(d)),
        "eq_e": to_mont(rand_ints(d)),
        "prd_b": to_mont(rand_ints(5)),
        "prd_e": to_mont(rand_ints(1)),
    }


def test_sigma_protocols():
    from legosnark_tpu.curve.group import g1_generator
    g = g1_generator()
    h = G1.double(G1.double(g))  # some independent-looking base

    v, r0, r1, k, e = (to_mont(rand_ints(1)) for _ in range(5))
    c0 = sigma.pedersen(g, h, v, r0)
    c1 = sigma.pedersen(g, h, v, r1)
    pf = jax.jit(sigma.zkeq_prove)(g, h, r0, r1, k, e)
    assert bool(np.all(jax.jit(sigma.zkeq_verify)(h, c0, c1, pf, e)))
    # different committed values must fail
    c_bad = sigma.pedersen(g, h, to_mont(rand_ints(1)), r1)
    assert not bool(np.all(jax.jit(sigma.zkeq_verify)(h, c0, c_bad, pf, e)))

    x, rx, y, ry, rz = (to_mont(rand_ints(1)) for _ in range(5))
    bs = to_mont(rand_ints(5))
    from legosnark_tpu.curve.group import FR_OPS
    z = FR_OPS.mul(x, y)
    cx = sigma.pedersen(g, h, x, rx)
    cy = sigma.pedersen(g, h, y, ry)
    cz = sigma.pedersen(g, h, z, rz)
    pf = jax.jit(sigma.zkprd_prove)(g, h, x, rx, y, ry, rz, bs, e)
    assert bool(np.all(jax.jit(sigma.zkprd_verify)(g, h, cx, cy, cz, pf, e)))
    cz_bad = sigma.pedersen(g, h, x, rz)
    assert not bool(np.all(
        jax.jit(sigma.zkprd_verify)(g, h, cx, cy, cz_bad, pf, e)))


@pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host
def test_cppoly_roundtrip():
    d = 3
    key = cppoly.keygen(d, seed=1)
    v = to_mont(rand_ints(1 << d))
    r = to_mont(rand_ints(d))

    # jax.jit directly over PolyKey args: d is static (tuple length)
    cm = jax.jit(cppoly.commit)(key, v)
    ans, ans_c = jax.jit(cppoly.compute_answer)(key, v, r)
    pf = jax.jit(cppoly.prove)(key, v, r)

    # EAGER verify: routes the pairings through the shared decomposed
    # graphs (curve/pairing.py) instead of compiling a per-test module
    assert bool(np.all(np.asarray(cppoly.check_commit(key, cm))))
    assert bool(np.all(np.asarray(cppoly.verify(key, cm, ans_c, r, pf))))

    # tampered answer must fail
    bad = G1.scalar_mul(
        key.g1, fl.from_mont(FR, to_mont(rand_ints(1))))
    assert not bool(np.all(np.asarray(
        cppoly.verify(key, cm, bad, r, pf))))


@pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host
def test_cphad_roundtrip():
    n, d = 8, 3
    key = cphad.keygen(n, seed=2)
    a = rand_ints(n)
    b = rand_ints(n)
    c = [(x * y) % R for x, y in zip(a, b)]
    am, bm, cm_v = to_mont(a), to_mont(b), to_mont(c)

    a_cm = jax.jit(cphad.commit_vec)(key, am)
    b_cm = jax.jit(cphad.commit_vec)(key, bm)
    c_cm = jax.jit(cphad.commit_vec)(key, cm_v)

    rho = to_mont(rand_ints(d))
    chal = to_mont(rand_ints(d))
    sr = mk_sigma_rand(d)

    pf = cphad.prove(key, am, bm, cm_v, rho, chal, sr)
    assert bool(np.all(cphad.verify(key, a_cm, b_cm, c_cm, pf, sr)))

    # wrong hadamard product must fail
    c_bad = list(c)
    c_bad[0] = (c_bad[0] + 1) % R
    cbm = to_mont(c_bad)
    cb_cm = jax.jit(cphad.commit_vec)(key, cbm)
    pf_bad = cphad.prove(key, am, bm, cbm, rho, chal, sr)
    # proof of the tampered c against commitments of a, b, c_bad:
    # sumcheck root (c~(rho)) no longer equals sum eq*a*b -> some check fails
    assert not bool(np.all(cphad.verify(key, a_cm, b_cm, cb_cm, pf_bad, sr)))


def _mk_matrices(n):
    A = [rand_ints(n) for _ in range(n)]
    B = [rand_ints(n) for _ in range(n)]
    C = [[sum(A[i][k] * B[k][j] for k in range(n)) % R for j in range(n)]
         for i in range(n)]
    stack = lambda M: jnp.asarray(
        np.stack([FR.to_mont_ints(row) for row in M]))
    return stack(A), stack(B), stack(C), C


@pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host
def test_cpmat_in_clear_roundtrip():
    n, d = 4, 2
    key = cpmat.keygen(n, seed=3)
    Am, Bm, Cm, C = _mk_matrices(n)

    a_cm = jax.jit(cpmat.commit_matrix)(key, Am)
    b_cm = jax.jit(cpmat.commit_matrix)(key, Bm)

    r = to_mont(rand_ints(d))
    s = to_mont(rand_ints(d))
    chal = to_mont(rand_ints(d))
    nonces = {"eq_k": to_mont(rand_ints(d)), "prd_b": to_mont(rand_ints(5))}
    hv = {"eq_e": to_mont(rand_ints(d)), "prd_e": to_mont(rand_ints(1))}

    pf = cpmat.prove_output_in_clear(key, Am, Bm, Cm, r, s, nonces,
                                     challenges=chal, hv_rand=hv)
    assert bool(np.all(cpmat.verify_output_in_clear(
        key, a_cm, b_cm, Cm, pf, hv_rand=hv)))

    # wrong product matrix must fail
    C_bad = [row[:] for row in C]
    C_bad[0][0] = (C_bad[0][0] + 1) % R
    Cbm = jnp.asarray(np.stack([FR.to_mont_ints(row) for row in C_bad]))
    assert not bool(np.all(cpmat.verify_output_in_clear(
        key, a_cm, b_cm, Cbm, pf, hv_rand=hv)))


@pytest.mark.slow
def test_cpmat_committed_roundtrip():
    n, d = 4, 2
    key = cpmat.keygen(n, seed=4)
    Am, Bm, Cm, _ = _mk_matrices(n)

    a_cm = jax.jit(cpmat.commit_matrix)(key, Am)
    b_cm = jax.jit(cpmat.commit_matrix)(key, Bm)
    c_cm = jax.jit(cpmat.commit_matrix)(key, Cm)

    r = to_mont(rand_ints(d))
    s = to_mont(rand_ints(d))
    chal = to_mont(rand_ints(d))
    nonces = {"eq_k": to_mont(rand_ints(d)), "prd_b": to_mont(rand_ints(5))}
    hv = {"eq_e": to_mont(rand_ints(d)), "prd_e": to_mont(rand_ints(1))}

    pf = cpmat.prove(key, Am, Bm, Cm, r, s, nonces, challenges=chal,
                     hv_rand=hv)
    assert bool(np.all(cpmat.verify(key, a_cm, b_cm, c_cm, pf,
                                    hv_rand=hv)))
