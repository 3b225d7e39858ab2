"""Breakdown of full-msm cost by cumulative stages (all inside one jit
with lax.map over windows, mirroring msm.msm exactly)."""
import time, sys, functools
import numpy as np
import jax
import jax.numpy as jnp

from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1, g1_generator, Point
from legosnark_tpu.curve import msm as msm_mod
from legosnark_tpu.fields import limb as fl

C = G1
FR = bn254.FR
log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
n = 1 << log_n
rng = np.random.default_rng(0)
vals = [int.from_bytes(rng.bytes(40), "little") % bn254.R for _ in range(64)]
scalars = jnp.asarray(np.tile(fl.ints_to_limbs(vals, FR.nlimbs), (1, n // 64)))
base = g1_generator()
ks = jnp.asarray(fl.ints_to_limbs(range(1, 65), FR.nlimbs))
b64 = Point(*(jnp.broadcast_to(x, x.shape[:-1] + (64,)) for x in base))
pts64 = jax.jit(G1.scalar_mul)(b64, ks)
points = Point(*(jnp.tile(np.asarray(x), (1, n // 64)) for x in pts64))
K = msm_mod._SUF_CHUNK


def win(d, stage):
    order = jnp.argsort(d)
    if stage == 0:   # sort only
        return Point(*(x[..., :128] for x in points)), order[:128]
    d_sorted = d[order]
    ps = msm_mod.point_index(points, order)
    if stage == 1:   # sort + gather
        return Point(*(x[..., :128] for x in ps)), order[:128]
    ts = jnp.arange(1, 1 << c, dtype=d_sorted.dtype)
    idx = jnp.searchsorted(d_sorted, ts, side="left")
    safe = jnp.minimum(idx, n - 1)
    if stage == 2:   # + searchsorted
        return Point(*(x[..., :128] for x in ps)), safe[:128]
    J = n // K
    blocks = msm_mod.point_map(
        lambda x: jnp.moveaxis(x.reshape(x.shape[:-1] + (J, K)), -2, 0), ps)
    loc = jax.lax.associative_scan(C.add, blocks, reverse=True,
                                   axis=blocks.x.ndim - 1)
    tot = msm_mod.point_map(lambda x: jnp.moveaxis(x[..., 0], 0, -1), loc)
    stot = jax.lax.associative_scan(C.add, tot, reverse=True,
                                     axis=tot.x.ndim - 1)
    tex = msm_mod.point_map(
        lambda s, i: jnp.concatenate([s[..., 1:], i], axis=-1),
        stot, C.identity((1,)))
    flat = msm_mod.point_map(
        lambda x: jnp.moveaxis(x, 0, -2).reshape(x.shape[1:-1] + (n,)), loc)
    if stage == 3:   # + scan
        return Point(*(x[..., :128] for x in flat)), safe[:128]
    q = C.add(msm_mod.point_index(flat, safe),
              msm_mod.point_index(tex, safe // K))
    q = C.select(idx < n, q, C.identity((ts.shape[0],)))
    s = C.sum_reduce(q)
    return Point(*(jnp.broadcast_to(x, x.shape[:-1] + (128,)) for x in s)), \
        safe[:128]


def full(stage, s):
    digits = msm_mod._all_digits(FR, s, c)
    return jax.lax.map(functools.partial(win, stage=stage), digits)


prev = 0.0
names = ["sort", "+gather", "+searchsorted", "+scan", "+bucket"]
for stage in range(5):
    f = jax.jit(functools.partial(full, stage))
    out = f(scalars); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(scalars)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{names[stage]:14s} cum {dt*1e3:8.1f} ms   delta "
          f"{(dt-prev)*1e3:8.1f} ms", flush=True)
    prev = dt
