"""CPU-mesh tests for the multi-chip sharding layer (parallel/sharded).

These exercise the exact path `__graft_entry__.dryrun_multichip` runs —
the round-1 regression (shard_map out_specs tuple-vs-Point pytree
mismatch) is covered by test_msm_sharded_matches_unsharded.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1, g1_generator, Point
from legosnark_tpu.curve import msm as msm_mod
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.parallel import sharded
from legosnark_tpu.prototools import mle, ntt as ntt_mod

FR = bn254.FR


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh(8)


def _rand_scalars(rng, n):
    return jnp.asarray(fl.ints_to_limbs(
        [int(x) % bn254.R for x in rng.integers(0, 1 << 62, size=n)],
        FR.nlimbs))


def _rand_mont(rng, n):
    return jnp.asarray(FR.to_mont_ints(
        [int(x) for x in rng.integers(0, 1 << 60, size=n)]))


def _gen_points(n):
    base = g1_generator()
    return Point(*(jnp.broadcast_to(x, x.shape[:-1] + (n,)) for x in base))


def test_msm_sharded_matches_unsharded(mesh):
    n = 32
    rng = np.random.default_rng(7)
    scalars = _rand_scalars(rng, n)
    points = _gen_points(n)
    ref = msm_mod.msm(G1, points, scalars, c=4)
    out = sharded.msm_sharded(G1, points, scalars, mesh, c=4)
    assert isinstance(out, Point)
    assert bool(np.all(np.asarray(G1.eq(out, ref))))


def test_msm_sharded_under_jit(mesh):
    """dryrun_multichip jits over msm_sharded; make sure that composes."""
    n = 16
    rng = np.random.default_rng(8)
    scalars = _rand_scalars(rng, n)
    points = _gen_points(n)

    @jax.jit
    def step(px, py, pz, s):
        p = sharded.msm_sharded(G1, Point(px, py, pz), s, mesh, c=4)
        return p.x, p.y, p.z

    out = Point(*step(points.x, points.y, points.z, scalars))
    ref = msm_mod.msm(G1, points, scalars, c=4)
    assert bool(np.all(np.asarray(G1.eq(out, ref))))


def test_field_sum_sharded(mesh):
    rng = np.random.default_rng(9)
    vals = [int(x) for x in rng.integers(0, 1 << 60, size=64)]
    v = jnp.asarray(FR.to_mont_ints(vals))
    sv = sharded.shard_table(v, 8)
    out = sharded.field_sum_sharded(sv, mesh)
    expect = sum(vals) % FR.p
    assert FR.from_mont_limbs(np.asarray(out)[..., 0]) == expect


def test_fold_sharded(mesh):
    rng = np.random.default_rng(10)
    v = _rand_mont(rng, 64)
    r = jnp.asarray(FR.to_mont_int(12345))
    sv = sharded.shard_table(v, 8)
    out = sharded.unshard_table(sharded.fold_sharded(sv, r, mesh))
    ref = mle.fold(v, r)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_shard_table_roundtrip():
    rng = np.random.default_rng(12)
    v = _rand_mont(rng, 32)
    assert np.array_equal(
        np.asarray(sharded.unshard_table(sharded.shard_table(v, 8))),
        np.asarray(v))


def test_sumcheck_rounds_sharded_matches_local(mesh):
    rng = np.random.default_rng(11)
    d, k = 5, 2
    tables = jnp.stack([_rand_mont(rng, 1 << d) for _ in range(k)])
    chal = _rand_mont(rng, d)
    ref = jax.jit(mle.prove_rounds)(tables, chal)
    out = sharded.sumcheck_rounds_sharded(tables, chal, mesh)
    assert np.array_equal(np.asarray(out.h_coeffs), np.asarray(ref.h_coeffs))
    assert np.array_equal(np.asarray(out.zs), np.asarray(ref.zs))
    assert np.array_equal(np.asarray(out.finals), np.asarray(ref.finals))


def test_ntt_sharded_matches_local(mesh):
    rng = np.random.default_rng(13)
    v = _rand_mont(rng, 1 << 8)
    want = jax.jit(ntt_mod.ntt)(v)
    got = sharded.ntt_sharded(v, mesh)
    assert np.array_equal(np.asarray(fl.canon(FR, want)),
                          np.asarray(fl.canon(FR, got)))
    # inverse round-trips
    back = sharded.ntt_sharded(got, mesh, inverse=True)
    assert np.array_equal(np.asarray(fl.canon(FR, back)),
                          np.asarray(fl.canon(FR, v)))
