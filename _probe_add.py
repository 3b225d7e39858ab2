import time, json, sys
import numpy as np, jax, jax.numpy as jnp
import legosnark_tpu.config
from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1, g1_generator, Point
from legosnark_tpu.fields import limb as fl
n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
P = Point(*(jnp.broadcast_to(x, x.shape[:-1] + (n,)) for x in g1_generator()))
f = jax.jit(G1.add)
t0=time.perf_counter(); low = f.lower(P, P); t1=time.perf_counter()
comp = low.compile(); t2=time.perf_counter()
out = comp(P, P); jax.block_until_ready(out); t3=time.perf_counter()
for _ in range(5):
    out = comp(P, P); jax.block_until_ready(out)
t4=time.perf_counter()
print(json.dumps({"n": n, "trace_s": round(t1-t0,2), "compile_s": round(t2-t1,2),
  "run_ms": round((t4-t3)/5*1e3,2), "adds_per_s": round(n/((t4-t3)/5),0)}))
