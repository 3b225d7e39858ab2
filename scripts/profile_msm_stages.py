"""Per-stage MSM timing on the real TPU: sort vs gather vs scan vs
bucket-boundary phases of the column-major `_window_sum` path.
Run: python scripts/profile_msm_stages.py [log_n] [c]"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import legosnark_tpu.config  # noqa: F401
from legosnark_tpu.curve import bn254, msm as msm_mod
from legosnark_tpu.curve.group import G1, g1_generator, Point, point_map
from legosnark_tpu.fields import limb as fl

FR = bn254.FR
log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
n = 1 << log_n

rng = np.random.default_rng(0)
vals = [int.from_bytes(rng.bytes(40), "little") % bn254.R for _ in range(64)]
block = fl.ints_to_limbs(vals, FR.nlimbs)
scalars = jnp.asarray(np.tile(block, (1, n // 64)))
base = g1_generator()
points = Point(*(jnp.broadcast_to(x, x.shape[:-1] + (n,)) for x in base))
digits0 = jax.jit(lambda s: msm_mod._all_digits(FR, s, c))(scalars)[0]


def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    # double warmup: on the tunneled TPU platform block_until_ready
    # spuriously returns early on the FIRST post-compile execution;
    # np.asarray forces a real sync
    for _ in range(2):
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# stage 1: argsort of digits
t_sort = bench("argsort[n]", lambda d: jnp.argsort(d), digits0)
order = jax.jit(jnp.argsort)(digits0)
d_sorted = jax.jit(lambda d, o: d[o])(digits0, order)

# stage 1b: searchsorted for the 2^c-1 bucket boundaries
ts = jnp.arange(1, 1 << c, dtype=d_sorted.dtype)
t_ss = bench("searchsorted[2^c-1]",
             lambda ds: jnp.searchsorted(ds, ts, side="left",
                                         method="sort"), d_sorted)

w = msm_mod._SCAN_LANES
use_cm = n % w == 0 and n // w >= 8
L = points.x.shape[-2]
h = -(-L // 2)
fuse = n <= msm_mod._FUSE_GATHER_MAX
packed = jax.jit(lambda p: msm_mod._pack_cat(p) if fuse
                 else point_map(msm_mod._pack16, p))(points)

if use_cm:
    G = n // w

    def do_gather(pk, o):
        idx2d = jnp.transpose(o.reshape(w, G))
        if fuse:
            g = jnp.moveaxis(jnp.take(pk, idx2d, axis=-1), -2, 0)
            return Point(*(msm_mod._unpack16(g[..., i*h:(i+1)*h, :], L)
                           for i in range(3)))
        return point_map(
            lambda a: msm_mod._unpack16(
                jnp.moveaxis(jnp.take(a, idx2d, axis=-1), -2, 0), L), pk)

    t_gather = bench("gather (col-major, packed)", do_gather, packed, order)
    ps = jax.jit(do_gather)(packed, order)

    t_scan = bench("column assoc-scan [G,..,w]",
                   lambda p: jax.lax.associative_scan(
                       G1.add, p, reverse=True, axis=0), ps)
else:
    ps = jax.jit(msm_mod.point_index)(points, order)
    t_scan = bench("suffix scan (lane)", lambda p: msm_mod._suffix_scan(
        G1, p), ps)

# stage 4: full single window
t_win = bench("full window_sum",
              lambda p, d_, pk: msm_mod._window_sum(G1, p, d_, c, packed=pk),
              points, digits0, packed, reps=2)

# raw group-add throughput: one n-wide add
t_add = bench("one n-wide G1.add", lambda a, b: G1.add(a, b), ps, ps, reps=5)
print(f"\nadds/s (n-wide): {n/t_add:.3e}")
W = msm_mod._num_windows(FR.bits, c)
print(f"window {t_win*1e3:.1f} ms x W={W} -> est total {t_win*W*1e3:.0f} ms "
      f"-> {n/(t_win*W):.3e} pps")
print(f"breakdown/window: sort {t_sort*1e3:.1f} + search {t_ss*1e3:.1f} + "
      f"gather {t_gather*1e3 if use_cm else 0:.1f} + scan {t_scan*1e3:.1f} ms")

# raw field mul throughput
a = ps.x if not use_cm else points.x
t_mul = bench("one n-wide mont_mul", lambda x, y: fl.mont_mul(bn254.FQ, x, y),
              a, a, reps=10)
print(f"mont_muls/s (n-wide): {n/t_mul:.3e}")
