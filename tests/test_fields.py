"""Limb-engine field arithmetic vs Python bigints (bit-exact).

Element layout under test: [..., L, V] — limb axis second-to-last,
batch vector axis last (see fields/limb.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.fields import limb as fl
from legosnark_tpu.curve.bn254 import FQ, FR, Q, R

RNG = np.random.default_rng(1234)


def rand_ints(spec, n):
    return [int(RNG.integers(0, 1 << 63)) ** 4 % spec.p for _ in range(n)]


def to_limbs_batch(spec, xs):
    """ints -> [L, n] canonical limbs."""
    return jnp.asarray(fl.ints_to_limbs(xs, spec.nlimbs))


def col(v, i):
    """Limb column i of a [L, n] array -> [L]."""
    return np.asarray(v)[..., :, i]


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_roundtrip(spec):
    xs = rand_ints(spec, 8) + [0, 1, spec.p - 1]
    v = to_limbs_batch(spec, xs)
    back = fl.limbs_to_ints(np.asarray(v))
    assert list(back) == xs


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_add_sub_neg(spec):
    xs = rand_ints(spec, 16) + [0, 0, 1, spec.p - 1]
    ys = rand_ints(spec, 16) + [0, spec.p - 1, spec.p - 1, spec.p - 1]
    a, b = to_limbs_batch(spec, xs), to_limbs_batch(spec, ys)
    add = fl.limbs_to_ints(np.asarray(jax.jit(fl.add, static_argnums=0)(spec, a, b)))
    sub = fl.limbs_to_ints(np.asarray(jax.jit(fl.sub, static_argnums=0)(spec, a, b)))
    ng = fl.limbs_to_ints(np.asarray(jax.jit(fl.neg, static_argnums=0)(spec, b)))
    # ops keep values in the redundant domain [0, 2p): compare mod p
    # and assert the domain invariant
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert int(add[i]) % spec.p == (x + y) % spec.p
        assert int(add[i]) < 2 * spec.p
        assert int(sub[i]) % spec.p == (x - y) % spec.p
        assert int(sub[i]) < 2 * spec.p
        assert int(ng[i]) % spec.p == (-y) % spec.p
        assert int(ng[i]) < 2 * spec.p


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_mont_mul(spec):
    xs = rand_ints(spec, 24) + [0, 1, spec.p - 1, spec.p - 1]
    ys = rand_ints(spec, 24) + [spec.p - 1, 1, spec.p - 1, 0]
    a = jnp.asarray(spec.to_mont_ints(xs))
    b = jnp.asarray(spec.to_mont_ints(ys))
    out = np.asarray(jax.jit(fl.mont_mul, static_argnums=0)(spec, a, b))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert spec.from_mont_limbs(col(out, i)) == x * y % spec.p


@pytest.mark.parametrize("spec", [FQ, FR], ids=["Fq", "Fr"])
def test_to_from_mont(spec):
    xs = rand_ints(spec, 8) + [0, 1, spec.p - 1]
    a = to_limbs_batch(spec, xs)
    m = jax.jit(fl.to_mont, static_argnums=0)(spec, a)
    back = np.asarray(jax.jit(fl.from_mont, static_argnums=0)(spec, m))
    assert [fl.limbs_to_int(col(back, i)) for i in range(len(xs))] == xs


def test_inv():
    xs = rand_ints(FR, 6) + [1, R - 1]
    a = jnp.asarray(FR.to_mont_ints(xs))
    out = np.asarray(jax.jit(fl.inv, static_argnums=0)(FR, a))
    for i, x in enumerate(xs):
        assert FR.from_mont_limbs(col(out, i)) == pow(x, -1, R)
    # inv(0) == 0 convention
    z = fl.zero(FR, (1,))
    assert fl.limbs_to_int(np.asarray(fl.inv(FR, z))) == 0


def test_batch_inv_scan():
    xs = rand_ints(FR, 5) + [0, 1]
    a = jnp.asarray(FR.to_mont_ints(xs))
    out = np.asarray(fl.batch_inv_scan(FR, a))
    for i, x in enumerate(xs):
        expect = pow(x, -1, R) if x else 0
        assert FR.from_mont_limbs(col(out, i)) == expect


def test_carry_worst_case_chains():
    """Adversarial carry/borrow chains (all-MASK limbs etc.)."""
    L = FR.nlimbs
    # x = p-1, add 1 -> 0 mod p
    a = to_limbs_batch(FR, [FR.p - 1])
    b = to_limbs_batch(FR, [1])
    s = np.asarray(fl.add(FR, a, b))
    assert fl.limbs_to_int(col(s, 0)) % FR.p == 0
    # value with long runs of MASK limbs
    chain = (1 << (13 * (L - 1))) - 1  # limbs: MASK * (L-1)
    x = chain % FR.p
    y = (FR.p - chain) % FR.p
    s2 = np.asarray(fl.add(FR, to_limbs_batch(FR, [x]), to_limbs_batch(FR, [y])))
    assert fl.limbs_to_int(col(s2, 0)) % FR.p == 0
    # canon maps every representative back below p
    assert fl.limbs_to_int(np.asarray(fl.canon(FR, s2))) == 0


def test_get_window():
    x = rand_ints(FR, 1)[0]
    a = to_limbs_batch(FR, [x])
    # widths beyond one limb (14/16/19) can span up to three 13-bit
    # limbs; start offsets chosen so two- and three-limb spans both hit
    for start, width in [(0, 13), (5, 13), (13, 8), (251, 3), (247, 7),
                         (0, 14), (16, 16), (12, 19), (25, 19),
                         (240, 14), (238, 16)]:
        w = int(np.asarray(fl.get_window(FR, a, start, width))[0])
        assert w == (x >> start) & ((1 << width) - 1)


def test_mont_pow():
    x = rand_ints(FR, 1)[0]
    a = jnp.asarray(FR.to_mont_ints([x]))
    for e in [0, 1, 2, 5, 1 << 20, R - 2]:
        out = np.asarray(fl.mont_pow(FR, a, e))
        assert FR.from_mont_limbs(col(out, 0)) == pow(x, e, R)


def test_leading_batch_axes():
    """Ops must work with extra leading batch dims: [B, L, V]."""
    xs = rand_ints(FR, 6)
    ys = rand_ints(FR, 6)
    a = jnp.asarray(FR.to_mont_ints(xs)).reshape(FR.nlimbs, 2, 3)
    a = jnp.moveaxis(a, 1, 0)                      # [2, L, 3]
    b = jnp.asarray(FR.to_mont_ints(ys)).reshape(FR.nlimbs, 2, 3)
    b = jnp.moveaxis(b, 1, 0)
    out = np.asarray(fl.mont_mul(FR, a, b))        # [2, L, 3]
    got = sorted(FR.from_mont_limbs(out[i, :, j])
                 for i in range(2) for j in range(3))
    want = sorted(x * y % R for x, y in zip(xs, ys))
    assert got == want
