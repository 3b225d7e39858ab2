"""Probe alternative per-window gather layouts for the MSM transport.

The production path gathers packed coords laid out [h, n] along the
lane axis (axis=-1): every gathered point touches h rows that are n*4
bytes apart in HBM — h cache lines per point. The candidates below
move the point axis leading so each point's limbs are contiguous:

  A  current: take([h, n], idx[G, w], axis=-1) -> [G, h, w]
  B  point-major: take([n, h], idx, axis=0) -> [G, w, h] -> transpose
  C  point-major fused (both affine coords in one [n, 2h] row)
  D  point-major, keep [G, w, h] and transpose via reshape-free moveaxis

Run: python scripts/probe_gather.py [log_n]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import legosnark_tpu.config  # noqa: F401

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << log_n
h = 10          # packed limb rows per coord (L=20 -> h=10)
w = 1 << 10     # scan lanes
G = n // w

rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 2**32, size=(h, n), dtype=np.uint64)
                .astype(np.uint32))
b = jnp.asarray(rng.integers(0, 2**32, size=(h, n), dtype=np.uint64)
                .astype(np.uint32))
order = jnp.asarray(rng.permutation(n).astype(np.int32))
idx2d = jnp.transpose(order.reshape(w, G))


def bench(name, fn, *args, reps=5):
    f = jax.jit(fn)
    for _ in range(2):
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# A: current per-coord lane-axis gather (2 coords)
def gA(x, y, ix):
    return (jnp.moveaxis(jnp.take(x, ix, axis=-1), -2, 0),
            jnp.moveaxis(jnp.take(y, ix, axis=-1), -2, 0))

bench("A lane-axis percoord [h,n] -> [G,h,w]", gA, a, b, idx2d)

# B: point-major gather + transpose back to [G, h, w]
aT = jnp.asarray(np.ascontiguousarray(np.asarray(a).T))   # [n, h]
bT = jnp.asarray(np.ascontiguousarray(np.asarray(b).T))

def gB(x, y, ix):
    gx = jnp.take(x, ix, axis=0)          # [G, w, h]
    gy = jnp.take(y, ix, axis=0)
    return (jnp.moveaxis(gx, -1, -2), jnp.moveaxis(gy, -1, -2))

bench("B point-major [n,h] -> [G,w,h] -> T", gB, aT, bT, idx2d)

# C: fused point-major: one [n, 2h] array for both coords
abT = jnp.concatenate([aT, bT], axis=-1)  # [n, 2h]

def gC(x, ix):
    g = jnp.take(x, ix, axis=0)           # [G, w, 2h]
    g = jnp.moveaxis(g, -1, -2)           # [G, 2h, w]
    return g[:, :h, :], g[:, h:, :]

bench("C point-major fused [n,2h]", gC, abT, idx2d)

# D: point-major, no transpose (downstream would index limbs on lanes)
def gD(x, y, ix):
    return jnp.take(x, ix, axis=0), jnp.take(y, ix, axis=0)

bench("D point-major no-transpose [G,w,h]", gD, aT, bT, idx2d)

# E: flat 1D gather with computed indices (h separate planes, flat idx)
flat = order  # [n]

def gE(x, y, o):
    gx = jnp.take(x, o, axis=-1)
    gy = jnp.take(y, o, axis=-1)
    return gx, gy

bench("E flat lane gather [h,n]->[h,n]", gE, a, b, flat)
