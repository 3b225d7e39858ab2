"""Pallas kernel correctness in interpreter mode (CPU).

The real kernels are exercised on TPU by bench.py/probes; these tests
run the same kernel bodies under `interpret=True` so the fused group
law and the sublane-shift Montgomery multiply stay covered by the CPU
suite. LEGOSNARK_PALLAS=1 forces the dispatch on.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from legosnark_tpu.curve import bn254
from legosnark_tpu.fields import limb as fl, pallas_limb
from legosnark_tpu.curve import pallas_group
from legosnark_tpu.curve.group import G1, g1_from_oracle, g1_to_oracle_batch

FR = bn254.FR
FQ = bn254.FQ
rng = np.random.default_rng(91)


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv("LEGOSNARK_PALLAS", "1")
    yield


def test_pallas_mont_mul_matches_bigint():
    n = 136  # deliberately not a multiple of 128: exercises padding
    xs = [int.from_bytes(rng.bytes(40), "little") % FR.p for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(40), "little") % FR.p for _ in range(n)]
    a = jnp.asarray(FR.to_mont_ints(xs))
    b = jnp.asarray(FR.to_mont_ints(ys))
    out = np.asarray(pallas_limb.mont_mul(FR, a, b))
    for i in range(0, n, 17):
        assert FR.from_mont_limbs(out[:, i]) == xs[i] * ys[i] % FR.p


def test_pallas_mont_mul_leading_batch():
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(8)]
    ys = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(8)]
    a = jnp.asarray(FQ.to_mont_ints(xs)).reshape(FQ.nlimbs, 2, 4)
    a = jnp.moveaxis(a, 1, 0)                       # [2, L, 4]
    b = jnp.asarray(FQ.to_mont_ints(ys)).reshape(FQ.nlimbs, 2, 4)
    b = jnp.moveaxis(b, 1, 0)
    out = np.asarray(pallas_limb.mont_mul(FQ, a, b))
    got = sorted(FQ.from_mont_limbs(out[i, :, j])
                 for i in range(2) for j in range(4))
    want = sorted(x * y % FQ.p for x, y in zip(xs, ys))
    assert got == want


def test_pallas_group_add_double_match_oracle():
    n = 8
    pts = [oracle.g1_mul(oracle.G1, k + 2) for k in range(n)]
    P = g1_from_oracle(pts)
    Q = jax.tree.map(lambda x: jnp.roll(x, -1, -1), P)

    S = pallas_group.add_points(FQ, 9, tuple(P), tuple(Q))
    D = pallas_group.double_point(FQ, 9, tuple(P))
    from legosnark_tpu.curve.group import Point
    got_s = g1_to_oracle_batch(Point(*S))
    got_d = g1_to_oracle_batch(Point(*D))
    for i in range(n):
        assert got_s[i] == oracle.g1_add(pts[i], pts[(i + 1) % n])
        assert got_d[i] == oracle.g1_add(pts[i], pts[i])

    # identity handling (complete law): P + identity == P
    ids = [None] * n
    I = g1_from_oracle(ids)
    S2 = pallas_group.add_points(FQ, 9, tuple(P), tuple(I))
    assert g1_to_oracle_batch(Point(*S2)) == pts


def test_pallas_lazy_reduction_chain():
    """v2 lazy-reduction soundness: long add/double chains at a width
    that disables output normalization (>128 lanes), so loose limbs and
    [0, 3.62p) values flow between kernel calls at their steady-state
    bounds; canon-compared against the bigint oracle."""
    from legosnark_tpu.curve.group import Point
    n = 160  # > _NORM_MAX: loose outputs; also exercises pad to 256
    pts = [oracle.g1_mul(oracle.G1, k + 1) for k in range(n)]
    P = g1_from_oracle(pts)
    acc = tuple(P)
    want = list(pts)
    for step in range(6):
        if step % 3 == 2:
            acc = pallas_group.double_point(FQ, 9, acc)
            want = [oracle.g1_add(w, w) for w in want]
        else:
            acc = pallas_group.add_points(FQ, 9, acc, tuple(P))
            want = [oracle.g1_add(w, p) for w, p in zip(want, pts)]
    got = g1_to_oracle_batch(Point(*acc))
    assert got == want

    # inverse pairs through the wide path: P + (-P) == identity, and
    # P + P through ADD (the doubling corner of the complete law)
    negs = [(x, FQ.p - y) for (x, y) in pts]
    N = g1_from_oracle(negs)
    Z = pallas_group.add_points(FQ, 9, tuple(P), tuple(N))
    assert g1_to_oracle_batch(Point(*Z)) == [None] * n
    D2 = pallas_group.add_points(FQ, 9, tuple(P), tuple(P))
    assert g1_to_oracle_batch(Point(*D2)) == [
        oracle.g1_add(p, p) for p in pts]
