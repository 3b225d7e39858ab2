import numpy as np, jax, jax.numpy as jnp
from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1, g1_generator, Point
from legosnark_tpu.curve import msm as msm_mod
from legosnark_tpu.fields import limb as fl
FR = bn254.FR
n = 1 << 14
rng = np.random.default_rng(0)
vals = [int.from_bytes(rng.bytes(40), "little") % bn254.R for _ in range(64)]
block = fl.ints_to_limbs(vals, FR.nlimbs)
scalars = jnp.asarray(np.tile(block, (1, n // 64)))
base = g1_generator()
ks = jnp.asarray(fl.ints_to_limbs(range(1, 65), FR.nlimbs))
b64 = Point(*(jnp.broadcast_to(x, x.shape[:-1] + (64,)) for x in base))
pts64 = jax.jit(G1.scalar_mul)(b64, ks)
points = Point(*(jnp.tile(np.asarray(x), (1, n // 64)) for x in pts64))
outs = {}
for c in (10, 13, 16):
    r = jax.jit(lambda p, s, c=c: msm_mod.msm(G1, p, s, c=c))(points, scalars)
    aff = G1.to_affine(r)
    outs[c] = tuple(np.asarray(a) for a in aff[:2])
ok = all(np.array_equal(outs[10][i], outs[c][i]) for c in (13, 16) for i in range(2))
print("agree(10,13,16):", ok)
