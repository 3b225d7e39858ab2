import sys, time, json
import numpy as np, jax, jax.numpy as jnp
import legosnark_tpu.config
from legosnark_tpu.curve import bn254
from legosnark_tpu.fields import limb as fl, pallas_limb
FR = bn254.FR
# correctness vs jnp path at small size (pallas forced)
import os
rng = np.random.default_rng(0)
xs = [int.from_bytes(rng.bytes(40), "little") % FR.p for _ in range(512)]
ys = [int.from_bytes(rng.bytes(40), "little") % FR.p for _ in range(512)]
a = jnp.asarray(FR.to_mont_ints(xs)); b = jnp.asarray(FR.to_mont_ints(ys))
out_p = np.asarray(jax.jit(lambda a,b: pallas_limb.mont_mul(FR, a, b))(a, b))
for i in range(0, 512, 37):
    got = FR.from_mont_limbs(out_p[:, i])
    want = xs[i]*ys[i] % FR.p
    assert got == want, (i, got, want)
print("pallas mont_mul correct on 512 elems")
# perf at 2^18
log_n, k = 18, 64
n = 1 << log_n
A = jnp.asarray(np.tile(FR.to_mont_ints([12345]), (1, n)))
B = jnp.asarray(np.tile(FR.to_mont_ints([67890]), (1, n)))
def chain(a, b):
    x = a
    for _ in range(k):
        x = pallas_limb.mont_mul(FR, x, b)
    return x
f = jax.jit(chain)
t0=time.perf_counter(); out=f(A,B); jax.block_until_ready(out)
t1=time.perf_counter()
for _ in range(3):
    out=f(A,B); jax.block_until_ready(out)
dt=(time.perf_counter()-t1)/3
print(json.dumps({"compile_s": round(t1-t0,1), "per_mul_us": round(dt/k*1e6,1),
  "elem_mul_per_s": round(n/(dt/k)/1e6, 2)}))
