"""G1/G2 complete group law vs the bigint oracle.

Validates the branchless Renes-Costello-Batina formulas that replace
libff's Jacobian arithmetic (reference call sites: MSM inner loops,
`/root/reference/src/utils/globl.h:47-78`). Everything runs jitted and
batched — eager per-op execution of the limb engine is pathologically
slow on CPU and is not a supported usage mode.
"""
import numpy as np
import jax
import pytest

import oracle as orc
from legosnark_tpu.curve import group as gp
from legosnark_tpu.curve.bn254 import R

RNG = np.random.default_rng(7)


def rand_scalars(n):
    return [int(RNG.integers(1, 1 << 62)) * int(RNG.integers(1, 1 << 62)) % R
            for _ in range(n)]


def roll_point(P):
    """Rotate the point batch along the vector (last) axis."""
    return gp.Point(np.roll(P.x, -1, -1), np.roll(P.y, -1, -1),
                    np.roll(P.z, -1, -1))


@pytest.fixture(scope="module")
def g1_batch():
    ks = rand_scalars(6)
    pts = [orc.g1_mul(orc.G1, k) for k in ks] + [None, orc.G1]
    return pts, gp.g1_from_oracle(pts)


@pytest.fixture(scope="module")
def g2_batch():
    ks = rand_scalars(4)
    pts = [orc.g2_mul(orc.G2, k) for k in ks] + [None, orc.G2]
    return pts, gp.g2_from_oracle(pts)


def test_g1_law(g1_batch):
    pts, P = g1_batch
    n = len(pts)
    Q = roll_point(P)

    @jax.jit
    def compute(P, Q):
        return (gp.G1.on_curve(P), gp.G1.add(P, Q), gp.G1.double(P),
                gp.G1.add(P, gp.G1.neg(P)))

    oncurve, S, D, Z = compute(P, Q)
    assert bool(np.all(np.asarray(oncurve)))
    # roundtrip through affine
    assert gp.g1_to_oracle_batch(P) == pts
    # P + (-P) == identity
    assert bool(np.all(np.asarray(gp.G1.is_identity(Z))))
    sums = gp.g1_to_oracle_batch(S)
    dbls = gp.g1_to_oracle_batch(D)
    for i in range(n):
        assert sums[i] == orc.g1_add(pts[i], pts[(i + 1) % n])
        assert dbls[i] == orc.g1_add(pts[i], pts[i])


def test_g1_scalar_mul(g1_batch):
    import legosnark_tpu.fields.limb as fl
    from legosnark_tpu.curve.bn254 import FR
    ks = [0, 1, 2, R - 1] + rand_scalars(2)
    P = gp.g1_generator((len(ks),))
    karr = fl.ints_to_limbs(ks, FR.nlimbs)
    out = jax.jit(gp.G1.scalar_mul)(P, karr)
    got = gp.g1_to_oracle_batch(out)
    for i, k in enumerate(ks):
        assert got[i] == orc.g1_mul(orc.G1, k)


def test_g2_law(g2_batch):
    pts, P = g2_batch
    n = len(pts)
    Q = roll_point(P)

    @jax.jit
    def compute(P, Q):
        return gp.G2.on_curve(P), gp.G2.add(P, Q), gp.G2.double(P)

    oncurve, S, D = compute(P, Q)
    assert bool(np.all(np.asarray(oncurve)))
    assert gp.g2_to_oracle_batch(P) == pts
    sums = gp.g2_to_oracle_batch(S)
    dbls = gp.g2_to_oracle_batch(D)
    for i in range(n):
        assert sums[i] == orc.g2_add(pts[i], pts[(i + 1) % n])
        assert dbls[i] == orc.g2_add(pts[i], pts[i])


def test_sum_reduce(g1_batch):
    pts, P = g1_batch
    total = jax.jit(gp.G1.sum_reduce)(P)
    expect = None
    for p in pts:
        expect = orc.g1_add(expect, p)
    assert gp.g1_to_oracle(total) == expect
