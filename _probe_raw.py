import sys, time, json
import numpy as np, jax, jax.numpy as jnp
import legosnark_tpu.config

n = 1 << 18
k = 200
a32 = jnp.asarray(np.random.randint(0, 1<<13, (24, n), dtype=np.uint32))
b32 = jnp.asarray(np.random.randint(0, 1<<13, (24, n), dtype=np.uint32))
af = a32.astype(jnp.float32)
bf = b32.astype(jnp.float32)

def chain_u32(a, b):
    x = a
    for _ in range(k):
        x = x * b + a
    return x

def chain_f32(a, b):
    x = a
    for _ in range(k):
        x = x * b + a
    return x

for name, f, args in [("u32_mad", chain_u32, (a32, b32)),
                      ("f32_mad", chain_f32, (af, bf))]:
    g = jax.jit(f)
    out = g(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(5):
        out = g(*args); jax.block_until_ready(out)
    dt=(time.perf_counter()-t0)/5
    ops = 24*n*k*2/dt
    print(json.dumps({"name": name, "sec": round(dt,4), "ops_per_s": f"{ops:.2e}"}))
