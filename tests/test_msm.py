"""MSM kernels vs the bigint oracle.

Covers the roles of `multiExpMA` (`/root/reference/src/utils/globl.h:63-78`)
and `simpleBatchExp` (`/root/reference/src/utils/util.h:119-134`).
"""
import numpy as np
import jax
import pytest

import oracle
from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import (
    G1, G2, FR_OPS, g1_generator, g2_generator,
    g1_from_oracle, g2_from_oracle, g1_to_oracle, g2_to_oracle,
    g1_to_oracle_batch,
)
from legosnark_tpu.curve import msm as msm_mod
from legosnark_tpu.fields import limb as fl

rng = np.random.default_rng(7)


def rand_fr_ints(n):
    return [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
            % bn254.R for _ in range(n)]


def fr_canonical(ints):
    """ints -> [L, n] canonical limbs (vector axis minor)."""
    return fl.ints_to_limbs(ints, bn254.FR.nlimbs)


def rand_g1_points(n):
    ks = rand_fr_ints(n)
    pts = [oracle.g1_mul(oracle.G1, k) for k in ks]
    return pts


@pytest.mark.parametrize("n,c", [(7, 4), (33, 6)])
def test_msm_g1_matches_oracle(n, c):
    pts = rand_g1_points(n)
    ks = rand_fr_ints(n)
    # include edge scalars: zero and one
    ks[0] = 0
    if n > 1:
        ks[1] = 1
    expected = None
    for p, k in zip(pts, ks):
        expected = oracle.g1_add(expected, oracle.g1_mul(p, k))

    points = g1_from_oracle(pts)
    scalars = fr_canonical(ks)
    out = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, c=c))(points, scalars)
    assert g1_to_oracle(out) == expected


def test_msm_g2_matches_oracle():
    n = 9
    ks = rand_fr_ints(n)
    pts = [oracle.g2_mul(oracle.G2, int(rng.integers(1, 1 << 40)))
           for _ in range(n)]
    expected = None
    for p, k in zip(pts, ks):
        expected = oracle.g2_add(expected, oracle.g2_mul(p, k))

    points = g2_from_oracle(pts)
    scalars = fr_canonical(ks)
    out = jax.jit(lambda p, s: msm_mod.msm(G2, p, s, c=5))(points, scalars)
    assert g2_to_oracle(out) == expected


def test_msm_all_zero_scalars():
    n = 5
    pts = rand_g1_points(n)
    points = g1_from_oracle(pts)
    scalars = fr_canonical([0] * n)
    out = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, c=5))(points, scalars)
    assert g1_to_oracle(out) is None


def test_fixed_base_batch_scalar_mul():
    n = 6
    ks = rand_fr_ints(n)
    ks[0] = 0
    base = g1_generator()
    table = jax.jit(
        lambda b: msm_mod.fixed_base_table(G1, b, c=8))(base)
    scalars = fr_canonical(ks)
    out = jax.jit(
        lambda t, s: msm_mod.batch_scalar_mul(G1, t, s, c=8))(table, scalars)
    got = g1_to_oracle_batch(out)
    for k, g in zip(ks, got):
        assert g == oracle.g1_mul(oracle.G1, k)


def test_msm_column_major_path_matches_legacy(monkeypatch):
    """The production window path (column-major axis-0 scan + packed
    transport gathers) against the legacy lane-scan path, on shapes
    small enough for CPU (G = 8 columns of 16)."""
    import numpy as np
    from legosnark_tpu.curve import msm as msm_mod
    from legosnark_tpu.curve.group import G1, g1_from_oracle, \
        g1_to_oracle
    from legosnark_tpu.curve import bn254
    from legosnark_tpu.fields import limb as fl
    import jax
    import jax.numpy as jnp
    import oracle

    n = 128
    rng = np.random.default_rng(7)
    vals = [int.from_bytes(rng.bytes(40), "little") % bn254.R
            for _ in range(n)]
    scalars = jnp.asarray(fl.ints_to_limbs(vals, bn254.FR.nlimbs))
    # oracle-built points: avoids a scalar_mul jit (minutes of compile)
    pts = g1_from_oracle(
        [oracle.g1_mul(oracle.G1, k + 3) for k in range(n)])

    monkeypatch.setattr(msm_mod, "_SCAN_LANES", 16)
    out_cm = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, c=4))(pts, scalars)
    monkeypatch.setattr(msm_mod, "_SCAN_LANES", 1 << 20)
    out_legacy = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, c=4))(
        pts, scalars)
    a, bb = g1_to_oracle(out_cm), g1_to_oracle(out_legacy)
    assert a == bb and a is not None


def test_msm_affine_path_matches(monkeypatch):
    """`points_affine=True` (z plane dropped from transport) after
    `to_affine_batch` vs the projective path, on the column-major
    layout; includes a zero scalar + an identity point with zero
    scalar (the padding contract)."""
    import jax
    import jax.numpy as jnp
    from legosnark_tpu.curve.group import to_affine_batch

    n = 128
    rng2 = np.random.default_rng(37)
    vals = [int.from_bytes(rng2.bytes(40), "little") % bn254.R
            for _ in range(n)]
    vals[0] = 0
    vals[5] = 0
    pts_o = [oracle.g1_mul(oracle.G1, k + 9) for k in range(n)]
    pts_o[5] = None  # identity point, zero scalar
    pts = g1_from_oracle(pts_o)
    scalars = fr_canonical(vals)

    monkeypatch.setattr(msm_mod, "_SCAN_LANES", 16)
    ref = g1_to_oracle(jax.jit(
        lambda p, s: msm_mod.msm(G1, p, s, c=4))(pts, scalars))
    aff = jax.jit(lambda p: to_affine_batch(G1, p))(pts)
    # affine z planes must be one-hot {0, 1}
    zvals = np.asarray(fl.from_mont(bn254.FQ, aff.z))
    ints = [fl.limbs_to_int(zvals[:, i]) for i in range(n)]
    assert set(ints) <= {0, 1} and ints[5] == 0
    got = g1_to_oracle(jax.jit(
        lambda p, s: msm_mod.msm(G1, p, s, c=4, points_affine=True))(
        aff, scalars))
    assert got == ref and got is not None
    # small-n (lane-scan) fallback too
    monkeypatch.setattr(msm_mod, "_SCAN_LANES", 1 << 20)
    got2 = g1_to_oracle(jax.jit(
        lambda p, s: msm_mod.msm(G1, p, s, c=5, points_affine=True))(
        aff, scalars))
    assert got2 == ref


def test_msm_split_gather_path_matches(monkeypatch):
    """The large-batch window variant (per-coord packed gathers,
    n > _FUSE_GATHER_MAX) against the fused variant."""
    import numpy as np
    from legosnark_tpu.curve import msm as msm_mod
    from legosnark_tpu.curve.group import G1, g1_from_oracle, g1_to_oracle
    from legosnark_tpu.curve import bn254
    from legosnark_tpu.fields import limb as fl
    import jax
    import jax.numpy as jnp
    import oracle

    n = 128
    rng = np.random.default_rng(17)
    vals = [int.from_bytes(rng.bytes(40), "little") % bn254.R
            for _ in range(n)]
    scalars = jnp.asarray(fl.ints_to_limbs(vals, bn254.FR.nlimbs))
    pts = g1_from_oracle(
        [oracle.g1_mul(oracle.G1, k + 5) for k in range(n)])

    monkeypatch.setattr(msm_mod, "_SCAN_LANES", 16)
    a = g1_to_oracle(jax.jit(
        lambda p, s: msm_mod.msm(G1, p, s, c=4))(pts, scalars))
    monkeypatch.setattr(msm_mod, "_FUSE_GATHER_MAX", 0)
    b = g1_to_oracle(jax.jit(
        lambda p, s: msm_mod.msm(G1, p, s, c=5))(pts, scalars))
    assert a == b and a is not None


def test_to_affine_batch_column_major():
    """Wide-batch (column-major recursive scan) normalization equals
    the original points projectively; z planes one-hot."""
    import jax
    import jax.numpy as jnp
    from legosnark_tpu.curve.group import to_affine_batch, g1_generator, Point

    n = 4096
    rng3 = np.random.default_rng(41)
    # distinct projective points via repeated doubling of shifted gens
    base = rand_g1_points(16)
    pts = g1_from_oracle([base[i % 16] for i in range(n)])
    # scale z arbitrarily: multiply coords by a random field element
    from legosnark_tpu.fields import limb as fl2
    sc = jnp.asarray(bn254.FQ.to_mont_ints(
        [int(rng3.integers(1, 1 << 60)) for _ in range(n)]))
    pts = Point(*(fl.mont_mul(bn254.FQ, c, sc) for c in pts))
    aff = jax.jit(lambda p: to_affine_batch(G1, p))(pts)
    zv = np.asarray(fl.from_mont(bn254.FQ, aff.z))
    ints = {fl.limbs_to_int(zv[:, i]) for i in range(0, n, 257)}
    assert ints <= {0, 1}
    eq = jax.jit(G1.eq)(pts, aff)
    assert bool(np.all(np.asarray(eq)))
