"""Microbenchmark: Pallas conv formulations for the limb product.
Finds where the mont-mul kernel time goes (shift-write vs multiply).
Run on TPU: python scripts/probe_conv.py [log_n]
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import legosnark_tpu.config  # noqa: F401

L = 20
TILE = 512
log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
N = 1 << log_n

rng = np.random.default_rng(0)
A = jnp.asarray(rng.integers(0, 1 << 13, size=(L, N), dtype=np.uint32))
B = jnp.asarray(rng.integers(0, 1 << 13, size=(L, N), dtype=np.uint32))


def run(name, kernel_fn, n_out_rows=2 * L, reps=5, scratch=True):
    bs_in = pl.BlockSpec((L, TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
    bs_out = pl.BlockSpec((n_out_rows, TILE), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel_fn,
        grid=(N // TILE,),
        in_specs=[bs_in, bs_in],
        out_specs=bs_out,
        out_shape=jax.ShapeDtypeStruct((n_out_rows, N), jnp.uint32),
        scratch_shapes=([pltpu.VMEM((2 * L, TILE), jnp.uint32)]
                        if scratch else []),
    )
    f = jax.jit(call)
    for _ in range(2):
        out = f(A, B)
        np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(A, B)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return dt


# 0. baseline: single elementwise multiply, writes 2L rows
def k_mul(a_ref, b_ref, o_ref, scr):
    a = a_ref[...]
    b = b_ref[...]
    o_ref[...] = jnp.concatenate([a * b, a + b], axis=0)

run("one mult [2L,T] out", k_mul)


# 1. current: scratch RMW at sublane offsets
def k_scratch(a_ref, b_ref, o_ref, scr):
    a = a_ref[...]
    b = b_ref[...]
    scr[...] = jnp.zeros_like(scr)
    for i in range(L):
        scr[i : i + L, :] += a[i : i + 1, :] * b
    o_ref[...] = scr[...]

run("conv scratch-RMW (current)", k_scratch)


# 2. value-built with jnp.pad shifts (no scratch)
def k_pad(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros((2 * L, TILE), jnp.uint32)
    for i in range(L):
        t = a[i : i + 1, :] * b
        acc = acc + jnp.pad(t, [(i, L - i), (0, 0)])
    o_ref[...] = acc

run("conv value + pad shifts", k_pad, scratch=False)


# 3. fixed-row accumulation: c_k = sum_i a_i * b_{k-i}, row reads only
def k_rows(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    rows = []
    for k in range(2 * L - 1):
        acc = None
        for i in range(max(0, k - L + 1), min(L, k + 1)):
            t = a[i : i + 1, :] * b[k - i : k - i + 1, :]
            acc = t if acc is None else acc + t
        rows.append(acc)
    rows.append(jnp.zeros((1, TILE), jnp.uint32))
    o_ref[...] = jnp.concatenate(rows, axis=0)

run("conv per-row [1,T] ops", k_rows, scratch=False)


# 4. roll-based: accumulate a_i * roll(b, i) over padded [2L, T]
def k_roll(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = jnp.pad(b_ref[...], [(0, L), (0, 0)])     # [2L, T]
    acc = jnp.zeros((2 * L, TILE), jnp.uint32)
    for i in range(L):
        acc = acc + a[i : i + 1, :] * pltpu.roll(b, i, 0)
    o_ref[...] = acc

run("conv roll shifts", k_roll, scratch=False)


# 5. dot with constant one-hot shift matrix on padded products
#    M[i, j] = a_i * b_j  (outer, [L, L, T] -> too big; instead use
#    dot(C [2L, L], a_i * b) accumulated — still L dots)
C_shift = np.zeros((L, 2 * L, L), dtype=np.float32)
for i in range(L):
    for j in range(L):
        C_shift[i, i + j, j] = 1.0


def k_dot(a_ref, b_ref, o_ref):
    a = a_ref[...].astype(jnp.int32).astype(jnp.float32)
    blo = (b_ref[...] & 0x7F).astype(jnp.int32).astype(jnp.float32)
    bhi = (b_ref[...] >> 7).astype(jnp.int32).astype(jnp.float32)
    # products a_i * b_j as [L*L, T] then one dot with [2L, L*L] const
    Mlo = (a[:, None, :] * blo[None, :, :]).reshape(L * L, TILE)
    Mhi = (a[:, None, :] * bhi[None, :, :]).reshape(L * L, TILE)
    # C[r, q] = 1 iff (q // L) + (q % L) == r  (built in-kernel: pallas
    # kernels may not capture array constants)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * L, L * L), 0)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * L, L * L), 1)
    Cm = ((q_ids // L + q_ids % L) == r_ids).astype(jnp.float32)
    lo = jax.lax.dot_general(Cm, Mlo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    hi = jax.lax.dot_general(Cm, Mhi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[...] = (lo + 128.0 * hi).astype(jnp.int32).astype(jnp.uint32)

run("conv outer+f32 dot (inexact)", k_dot, scratch=False)
