"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp path in `fields.limb` expresses the limb convolution as a
gather + broadcast-multiply + reduce: XLA materializes a [L, 2L-1, V]
intermediate (39x data expansion) and reaches only ~5-10% of the VPU's
u32 throughput. This kernel instead writes the schoolbook convolution
the way the hardware wants it: the limb axis lives on SUBLANES, and
each of the L partial products is one full-tile [L, T] multiply
accumulated into a [2L, T] VMEM scratch at a static sublane offset —
L tile-ops total, the optimal L^2 multiply count, zero gathers, all
intermediates resident in VMEM.

Layout contract matches fields/limb.py: inputs [B, L, V] uint32
canonical 13-bit limbs (B optional), output same. The kernel computes
a*b*R^-1 mod p with the same loose-carry/exact-carry structure (and
the same [0, 2p) redundant-domain guarantee) as `limb.mont_mul`.

Enabled automatically on TPU backends for vector widths >= _MIN_V
(LEGOSNARK_PALLAS=0 disables; =1 forces, e.g. for interpret-mode
tests on CPU).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb as fl

LIMB_BITS = fl.LIMB_BITS
LIMB_MASK = fl.LIMB_MASK

_TILE = int(os.environ.get("LEGOSNARK_PALLAS_TILE", "1024"))
_MIN_V = 256


def _flag():
    return os.environ.get("LEGOSNARK_PALLAS", "auto")


def enabled_for(v: int) -> bool:
    flag = _flag()
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return on_tpu and v >= _MIN_V


def _carry_exact_rows(x, nout: int, passes: int = 2):
    """Exact carry normalization along axis -2 (kernel-local copy of
    limb._carry_exact operating on concrete [R, T] values)."""
    def shift_up(c):
        pad = [(0, 0)] * (c.ndim - 2) + [(1, 0), (0, 0)]
        return jnp.pad(c[..., :-1, :], pad)

    k = x.shape[-2]
    if k < nout:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, nout - k), (0, 0)])
    elif k > nout:
        x = x[..., :nout, :]
    for _ in range(passes):
        x = (x & LIMB_MASK) + shift_up(x >> LIMB_BITS)
    g = x >> LIMB_BITS
    pr = x == LIMB_MASK
    j2 = jax.lax.broadcasted_iota(jnp.uint32, (nout, 1), 0) * 2 + 2
    t = jnp.where(pr, jnp.uint32(0), j2 + g)
    # cummax along rows via a Kogge-Stone max ladder (cummax is not a
    # Mosaic primitive, and unsigned max does not legalize — the values
    # are tiny, so run the ladder in int32)
    m = t.astype(jnp.int32)
    sh = 1
    while sh < nout:
        pad = [(0, 0)] * (m.ndim - 2) + [(sh, 0), (0, 0)]
        m = jnp.maximum(m, jnp.pad(m[..., : nout - sh, :], pad))
        sh *= 2
    cin = shift_up(m.astype(jnp.uint32) & 1)
    return (x + cin) & LIMB_MASK


def _carry_loose_rows(x):
    def shift_up(c):
        pad = [(0, 0)] * (c.ndim - 2) + [(1, 0), (0, 0)]
        return jnp.pad(c[..., :-1, :], pad)

    for _ in range(2):
        x = (x & LIMB_MASK) + shift_up(x >> LIMB_BITS)
    return x


def _mk_kernel(L: int, p_limbs: np.ndarray, ninv_limbs: np.ndarray):
    p_host = p_limbs.reshape(L)        # [L]
    ninv_host = ninv_limbs.reshape(L)

    def kernel(a_ref, b_ref, o_ref, t_scr, m_scr, u_scr):
        a = a_ref[...]                 # [.., L, T] (leading block dims 1)
        b = b_ref[...]
        a = a.reshape(a.shape[-2:])
        b = b.reshape(b.shape[-2:])

        # ---- t = a * b full columns into [2L, T] scratch -------------
        t_scr[...] = jnp.zeros_like(t_scr)
        for i in range(L):
            t_scr[i : i + L, :] += a[i : i + 1, :] * b
        t = _carry_loose_rows(t_scr[...])          # [2L, T] loose

        # ---- m = (t mod R) * ninv mod R ------------------------------
        t_lo = t[:L, :]
        m_scr[...] = jnp.zeros_like(m_scr)
        for i in range(L):
            # constant limb ninv[i] scales the shifted t_lo rows
            c = int(ninv_host[i])
            if c:
                m_scr[i:, :] += jnp.uint32(c) * t_lo[: L - i, :]
        m = _carry_loose_rows(m_scr[...])

        # ---- u = t + m * p; exact carry; return high limbs -----------
        u_scr[...] = t
        for i in range(L):
            c = int(p_host[i])
            if c:
                u_scr[i : i + L, :] += jnp.uint32(c) * m
        u = _carry_exact_rows(u_scr[...], 2 * L)
        o_ref[...] = u[L:, :].reshape(o_ref.shape)

    return kernel


@functools.lru_cache(None)
def _build_call(p: int, nlimbs: int, B: int, V: int, tile: int,
                three_d: bool):
    spec = fl.FieldSpec(p=p, nlimbs=nlimbs)
    L = nlimbs
    kernel = _mk_kernel(L, np.asarray(spec.p_limbs),
                        np.asarray(spec.ninv_limbs))
    if three_d:
        grid = (B, V // tile)
        bs = pl.BlockSpec((1, L, tile), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, L, V), jnp.uint32)
    else:
        grid = (V // tile,)
        bs = pl.BlockSpec((L, tile), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((L, V), jnp.uint32)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs, bs],
        out_specs=bs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2 * L, tile), jnp.uint32),
                        pltpu.VMEM((L, tile), jnp.uint32),
                        pltpu.VMEM((2 * L, tile), jnp.uint32)],
        interpret=interpret,
    )


def mont_mul(spec: fl.FieldSpec, a, b):
    """Pallas Montgomery product for [..., L, V] inputs (V % 128 == 0
    after padding, handled here). Falls back implicitly only through
    the caller (limb.mont_mul dispatch)."""
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape
    L = spec.nlimbs
    V = shape[-1]
    lead = shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    a3 = a.reshape((B, L, V)) if lead else a
    b3 = b.reshape((B, L, V)) if lead else b

    tile = _round_tile(V)
    Vp = -(-V // tile) * tile
    if Vp != V:
        pad = [(0, 0)] * (a3.ndim - 1) + [(0, Vp - V)]
        a3 = jnp.pad(a3, pad)
        b3 = jnp.pad(b3, pad)
    call = _build_call(spec.p, L, B, Vp, tile, bool(lead))
    out = call(a3, b3)
    if Vp != V:
        out = out[..., :V]
    return out.reshape(shape)


def _round_tile(v: int) -> int:
    t = 128
    while t * 2 <= min(v, _TILE):
        t *= 2
    return t
