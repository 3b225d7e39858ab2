"""Tile-size / path sweep for the fused G1 add kernel throughput."""
import os, sys, time
import numpy as np

tile = sys.argv[1] if len(sys.argv) > 1 else "1024"
os.environ["LEGOSNARK_PALLAS_TILE"] = tile
if len(sys.argv) > 2:
    os.environ["LEGOSNARK_PALLAS"] = sys.argv[2]

import jax
import jax.numpy as jnp
from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1, g1_generator, Point
from legosnark_tpu.fields import limb as fl

FR = bn254.FR
n = 1 << 18
rng = np.random.default_rng(0)
base = g1_generator()
ks = jnp.asarray(fl.ints_to_limbs(range(1, 65), FR.nlimbs))
b64 = Point(*(jnp.broadcast_to(x, x.shape[:-1] + (64,)) for x in base))
pts64 = jax.jit(G1.scalar_mul)(b64, ks)
p = Point(*(jnp.tile(np.asarray(x), (1, n // 64)) for x in pts64))

f = jax.jit(G1.add)
out = f(p, p); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = f(out, p)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 5
print(f"tile={tile} pallas={os.environ.get('LEGOSNARK_PALLAS','auto')} "
      f"add[2^18]: {dt*1e3:.1f} ms  ({n/dt/1e6:.1f}M adds/s)")
