import time, json, os, sys
import numpy as np, jax, jax.numpy as jnp
import legosnark_tpu.config
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
import oracle
from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1, g1_from_oracle, g1_to_oracle_batch, Point
from legosnark_tpu.fields import limb as fl

# correctness: fused pallas add/double vs oracle on 512 points
n = 512
ks = list(range(2, 2 + n))
pts = [oracle.g1_mul(oracle.G1, k) for k in ks]
P = g1_from_oracle(pts)
Q = Point(*(jnp.roll(x, -1, -1) for x in P))
S = jax.jit(G1.add)(P, Q)
D = jax.jit(G1.double)(P)
got_s = g1_to_oracle_batch(S)
got_d = g1_to_oracle_batch(D)
for i in range(0, n, 61):
    assert got_s[i] == oracle.g1_add(pts[i], pts[(i + 1) % n]), i
    assert got_d[i] == oracle.g1_add(pts[i], pts[i]), i
print("fused add/double correct", flush=True)

# perf: chained adds at 2^18
m = 1 << 18
Pb = Point(*(jnp.tile(np.asarray(x), (1, m // n)) for x in P))
Qb = Point(*(jnp.tile(np.asarray(x), (1, m // n)) for x in Q))
k = 16
def chain(p, q):
    acc = p
    for _ in range(k):
        acc = G1.add(acc, q)
    return acc
f = jax.jit(chain)
t0=time.perf_counter(); out=f(Pb, Qb); jax.block_until_ready(out)
t1=time.perf_counter()
for _ in range(3):
    out=f(Pb, Qb); jax.block_until_ready(out)
dt=(time.perf_counter()-t1)/3
print(json.dumps({"compile_s": round(t1-t0,1),
  "per_add_ms": round(dt/k*1e3,2),
  "adds_per_s": round(m/(dt/k)/1e6,2)}), "M adds/s")
