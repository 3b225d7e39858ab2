"""Per-stage MSM timing on the real TPU: sort vs gather vs scan vs
bucket tree. Run: python scripts/profile_msm_stages.py [log_n] [c]"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from legosnark_tpu.curve import bn254, msm as msm_mod
from legosnark_tpu.curve.group import G1, g1_generator, Point
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
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return dt


# stage 1: argsort of digits
bench("argsort[n]", lambda d: jnp.argsort(d), digits0)

order = jax.jit(jnp.argsort)(digits0)

# stage 2: gather points by order (3 coords x L x n u32)
bench("gather points", lambda p, o: msm_mod.point_index(p, o), points, order)

ps = jax.jit(msm_mod.point_index)(points, order)

# stage 3: suffix scan (two-level path as in _window_sum)
K = msm_mod._SUF_CHUNK
if n > K and n % K == 0:
    J = n // K

    def scan2(px, py, pz):
        p = Point(px, py, pz)
        blocks = msm_mod.point_map(
            lambda x: jnp.moveaxis(x.reshape(x.shape[:-1] + (J, K)), -2, 0), p)
        loc = jax.lax.associative_scan(
            G1.add, blocks, reverse=True, axis=blocks.x.ndim - 1)
        return loc

    t_scan = bench("suffix scan (2-level loc)", scan2, ps.x, ps.y, ps.z)
else:
    t_scan = bench("suffix scan", lambda px, py, pz: msm_mod._suffix_scan(
        G1, Point(px, py, pz)), ps.x, ps.y, ps.z)

# stage 4: full single window
t_win = bench("full window_sum", lambda p, d: msm_mod._window_sum(G1, p, d, c),
              points, digits0, reps=2)

# raw group-add throughput: one n-wide add
t_add = bench("one n-wide G1.add", lambda a, b: G1.add(a, b), ps, ps, reps=5)
print(f"\nadds/s (n-wide): {n/t_add:.3e}")
print(f"scan ~= {t_scan/t_add:.1f} n-wide adds; expect ~{int(np.log2(K))+1 if n<=K else 14} levels/2n work")
W = msm_mod._num_windows(FR.bits, c)
print(f"window {t_win*1e3:.1f} ms x W={W} -> est total {t_win*W*1e3:.0f} ms "
      f"-> {n/(t_win*W):.3e} pps")

# raw field mul throughput
a = ps.x
t_mul = bench("one n-wide mont_mul", lambda x, y: fl.mont_mul(bn254.FQ, x, y),
              a, a, reps=10)
print(f"mont_muls/s (n-wide): {n/t_mul:.3e}  -> add at 12M ~ {n/(12*t_mul):.3e} adds/s bound")
