"""Multi-chip sharding: the distributed-backend layer.

The reference's only parallelism is OpenMP chunking of MSM/FFT loops
(`/root/reference/src/utils/globl.h:51-77`, `sparsemexp.cc:5-9`,
`lipmaa.cc:125-173` — SURVEY §2.3). The TPU-native equivalent is a
`jax.sharding.Mesh` over ICI with `shard_map`:

  * `msm_sharded` — points/scalars sharded over the mesh axis, per-chip
    Pippenger (sort+scan windows), partial window sums all-gathered
    (tiny: one point per chip) and tree-reduced. This is the
    data-parallel MSM of BASELINE.md's ">=5x scaling 1->4 hosts" target.
  * `field_sum_sharded` / `fold_sharded` — the sumcheck table
    reductions and per-round folds on sharded 2^d tables (SURVEY §2.3
    item 2): fold is embarrassingly parallel when tables are sharded on
    the *high* index bits (pairs (2p, 2p+1) stay on-chip); the final
    field sum is a local tree-sum + cross-chip combine.

Everything works on any mesh size that divides the leading axis; the
tests and `__graft_entry__.dryrun_multichip` exercise an 8-device CPU
mesh (`--xla_force_host_platform_device_count`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, CurveOps
from ..curve import msm as msm_mod
from ..prototools import mle

FR = bn254.FR


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} devices "
            f"are visible (platform {devs[0].platform}); for virtual "
            "multi-chip set jax_platforms=cpu + "
            "--xla_force_host_platform_device_count")
    return Mesh(devs[:n], (axis,))


def _gather_points_tree_sum(C: CurveOps, p: Point, axis: str) -> Point:
    """All-gather single partial points along the mesh axis and
    tree-reduce locally (points are ~60 u32 limbs: negligible ICI
    traffic vs psum-style pre-reduction, and field adds are not a psum
    monoid)."""
    gx = jax.lax.all_gather(p.x, axis)
    gy = jax.lax.all_gather(p.y, axis)
    gz = jax.lax.all_gather(p.z, axis)
    return msm_mod._tree_reduce_axis0(C, Point(gx, gy, gz))


def msm_sharded(C: CurveOps, points: Point, scalars, mesh: Mesh,
                axis: str = "data", c: int | None = None) -> Point:
    """Data-parallel MSM: sum_i k_i P_i with i sharded over the mesh.

    Each chip runs the full windowed sort+scan MSM on its shard; the
    per-chip results (single points) are combined over ICI. Returns the
    replicated total.
    """
    n = scalars.shape[0]
    ndev = mesh.shape[axis]
    assert n % ndev == 0, "points must divide evenly over the mesh"
    if c is None:
        from .. import config
        import os
        env = os.environ.get("LEGOSNARK_MSM_C")
        c = int(env) if env else config.default_window(n // ndev)

    def local(px, py, pz, s):
        part = msm_mod.msm(C, Point(px, py, pz), s, c=c)
        return _gather_points_tree_sum(C, part, axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=Point(P(), P(), P()),
        check_rep=False)
    # jit so the shard_map body executes as ONE compiled program even
    # when called eagerly (per-op eager dispatch through shard_map is
    # pathologically slow on the limb engine)
    return jax.jit(fn)(points.x, points.y, points.z, scalars)


def field_sum_sharded(v, mesh: Mesh, axis: str = "data"):
    """Sharded modular sum along axis 0: local tree-sum, then combine
    the ndev partials after an all-gather."""
    def local(vs):
        part = mle.field_sum(vs)
        g = jax.lax.all_gather(part, axis)
        return mle.field_sum(g)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis),
                   out_specs=P(), check_rep=False)
    return jax.jit(fn)(v)


def fold_sharded(table, r, mesh: Mesh, axis: str = "data"):
    """One sumcheck fold on a table sharded over HIGH index bits: the
    (2p, 2p+1) pairs are adjacent, so the fold needs no communication;
    output stays sharded on the same axis (half the size per chip)."""
    def local(t, rr):
        return mle.fold(t, rr)

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=P(axis), check_rep=False)
    return jax.jit(fn)(table, r)


def sumcheck_rounds_sharded(tables, challenges, mesh: Mesh,
                            axis: str = "data"):
    """Distributed `prove_rounds` (SURVEY §2.3 item 2): tables [k, 2^d]
    sharded on the table axis. Each round's h-poly reduction is a
    local partial sum + cross-chip combine; folds stay local until the
    table fits on one chip, after which everything is replicated."""
    ndev = mesh.shape[axis]
    d = challenges.shape[0]
    k = tables.shape[0]
    assert (1 << d) % ndev == 0, "table must divide over the mesh"
    # rounds bind LOW index bits (adjacent pairs, on-shard); once the
    # per-shard width hits 1 the remaining variables ARE the shard
    # index: all-gather the k singletons and finish replicated.
    shard_w = (1 << d) // ndev

    def local(tabs, chals):
        hs, zs = [], []
        t = tabs                     # [k, shard_w, L], sharded
        w = shard_w
        sharded_mode = True
        for i in range(d):
            if sharded_mode and w == 1:
                # [k, 1, L] per chip -> replicated [k, ndev, L]
                g = jax.lax.all_gather(t[:, 0], axis)   # [ndev, k, L]
                t = jnp.moveaxis(g, 0, 1)               # [k, ndev, L]
                sharded_mode = False
            if sharded_mode:
                local_h = _round_poly_partial(t)
                g = jax.lax.all_gather(local_h, axis)   # [ndev, k+1, L]
                h = mle.field_sum(g)
            else:
                h = mle.round_poly(t)
            hs.append(h)
            r = chals[i]
            zs.append(mle.poly_eval(h, r))
            t = jax.vmap(lambda tt: mle.fold(tt, r))(t)
            w = max(w // 2, 1) if sharded_mode else t.shape[1]
        if sharded_mode:
            # all rounds were local (ndev == 1): t is [k, 1, L]
            finals = t[:, 0]
        else:
            finals = t[:, 0]
        z0 = fl.add(FR, mle.poly_eval(hs[0], fl.zero(FR)),
                    mle.poly_eval(hs[0], fl.one(FR)))
        return (jnp.stack(hs), finals,
                jnp.concatenate([z0[None], jnp.stack(zs)]))

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(None, axis), P()),
        out_specs=(P(), P(), P()), check_rep=False)
    h_coeffs, finals, zs = jax.jit(fn)(tables, challenges)
    return mle.SumcheckRounds(h_coeffs=h_coeffs, finals=finals, zs=zs)


def _round_poly_partial(tables):
    """Per-shard partial of `mle.round_poly` (no cross-shard terms —
    the sum over p splits cleanly across shards)."""
    k = tables.shape[0]
    lo = tables[:, 0::2]
    slope = fl.sub(FR, tables[:, 1::2], lo)
    coeffs = jnp.stack([lo[0], slope[0]])
    for t in range(1, k):
        c_lo = fl.mont_mul(FR, coeffs, lo[t][None])
        c_sl = fl.mont_mul(FR, coeffs, slope[t][None])
        zerorow = fl.zero(FR, (1,) + coeffs.shape[1:-1])
        coeffs = fl.add(
            FR,
            jnp.concatenate([c_lo, zerorow], axis=0),
            jnp.concatenate([zerorow, c_sl], axis=0))
    return mle.field_sum(jnp.swapaxes(coeffs, 0, 1))
