"""One-config MSM throughput probe: python scripts/bench_one.py [log_n] [c] [reps]
Honors LEGOSNARK_MSM_* env vars; prints one line."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import legosnark_tpu.config  # noqa: F401
from legosnark_tpu.curve import bn254, msm as msm_mod
from legosnark_tpu.curve.group import G1, g1_generator, to_affine_batch
from legosnark_tpu.utils import rand as lrand

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
n = 1 << log_n
rng = np.random.default_rng(0)

scalars = jnp.asarray(lrand.rand_fr_limbs_fast(rng, n))
ks = jnp.asarray(lrand.rand_fr_limbs_fast(rng, n))
table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
points = msm_mod.batch_scalar_mul(G1, table, ks, c=8)
points = jax.jit(lambda p: to_affine_batch(G1, p))(points)
jax.block_until_ready(points.x)

fn = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, c=c, points_affine=True))
t0 = time.perf_counter()
for _ in range(2):
    out = fn(points, scalars)
    np.asarray(out.x)
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(reps):
    out = fn(points, scalars)
    jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / reps
print(f"log_n={log_n} c={c} pps={n/dt:,.0f} run_ms={dt*1e3:.1f} "
      f"compile_s={compile_s:.1f}", flush=True)
