import sys, time, json
import numpy as np, jax, jax.numpy as jnp
import legosnark_tpu.config
from legosnark_tpu.curve import bn254
from legosnark_tpu.fields import limb as fl
FR = bn254.FR
log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
n = 1 << log_n
rng = np.random.default_rng(0)
a = jnp.asarray(np.tile(FR.to_mont_ints([12345]), (1, n)))
b = jnp.asarray(np.tile(FR.to_mont_ints([67890]), (1, n)))

def chain(a, b):
    x = a
    for _ in range(k):
        x = fl.mont_mul(FR, x, b)
    return x

f = jax.jit(chain)
t0=time.perf_counter(); out = f(a, b); jax.block_until_ready(out)
t1=time.perf_counter()
reps=3
t2=time.perf_counter()
for _ in range(reps):
    out = f(a, b); jax.block_until_ready(out)
dt=(time.perf_counter()-t2)/reps
per_mul = dt / k
# u32 ops per mul per element ~ 3 convs: 2*(20*39) + 20*20 muls + adds ~ 2000
ops = n * 2000 / per_mul
print(json.dumps({"log_n": log_n, "k": k, "compile_s": round(t1-t0,1),
  "per_mul_us": round(per_mul*1e6,1), "elem_mul_per_s": round(n/per_mul/1e6,2),
  "approx_u32_ops_per_s": f"{ops:.2e}"}))
