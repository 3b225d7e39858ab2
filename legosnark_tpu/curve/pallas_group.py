"""Fused Pallas kernels for the G1 group law (RCB complete add/double).

One `pallas_call` per group operation instead of 12 separate Montgomery
multiplies: all intermediates live in VMEM/registers, HBM traffic drops
to reading two points + writing one, and — critically on the tunneled
compile path — the MSM graph contains ~12x fewer kernel instances,
which is what makes the 2^18+ windowed-MSM program compile in minutes
instead of hours.

Field math mirrors fields/limb.py exactly (13-bit limbs on sublanes,
redundant domain [0, 2p), loose carries between muls, one exact carry
per mul output). G1 only (Fq base field); G2 stays on the jnp path —
its call sites are keygen-scale, not the prover hot loop.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import limb as fl
from . import bn254

LIMB_BITS = fl.LIMB_BITS
LIMB_MASK = fl.LIMB_MASK

_TILE = int(os.environ.get("LEGOSNARK_PALLAS_TILE", "512"))
_MIN_V = 2


def enabled_for(v: int) -> bool:
    flag = os.environ.get("LEGOSNARK_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    # even width-1 ops go through the kernel on TPU: a padded 128-lane
    # launch is cheap, while a single jnp-path RCB add adds ~3k HLO ops
    # to the graph and minutes to tunneled compiles
    return on_tpu and v >= _MIN_V


def _shift_up(c):
    pad = [(0, 0)] * (c.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(c[..., :-1, :], pad)


def _carry_passes(x, passes: int):
    for _ in range(passes):
        x = (x & LIMB_MASK) + _shift_up(x >> LIMB_BITS)
    return x


def _carry_exact_rows(x, nout: int, passes: int = 2):
    k = x.shape[-2]
    if k < nout:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, nout - k), (0, 0)])
    elif k > nout:
        x = x[..., :nout, :]
    x = _carry_passes(x, passes)
    g = x >> LIMB_BITS
    pr = x == LIMB_MASK
    j2 = jax.lax.broadcasted_iota(jnp.uint32, (nout, 1), 0) * 2 + 2
    t = jnp.where(pr, jnp.uint32(0), j2 + g)
    m = t.astype(jnp.int32)
    sh = 1
    while sh < nout:
        pad = [(0, 0)] * (m.ndim - 2) + [(sh, 0), (0, 0)]
        m = jnp.maximum(m, jnp.pad(m[..., : nout - sh, :], pad))
        sh *= 2
    cin = _shift_up(m.astype(jnp.uint32) & 1)
    return (x + cin) & LIMB_MASK


def _mk_field(spec: fl.FieldSpec):
    """In-kernel field helpers. Only Python-int per-limb constants are
    closed over (Pallas kernels may not capture array constants); the
    [L, 1]-shaped constants (R-2p, 2p+1, b3) arrive via a packed
    `consts` kernel input: rows [0:L] = R-2p, [L:2L] = 2p+1,
    [2L:3L] = b3 in Montgomery form."""
    L = spec.nlimbs
    p_host = np.asarray(spec.p_limbs).reshape(L)
    ninv_host = np.asarray(spec.ninv_limbs).reshape(L)

    def cond_sub_2p(x, r2p):
        # x + (R - 2p) mod R, keep iff it carried out (x >= 2p)
        s = x + r2p
        s = _carry_exact_rows(s, L + 1, passes=1)
        red, cout = s[:L, :], s[L, :]
        return jnp.where((cout > 0)[None, :], red, x)

    def mk_fadd(r2p):
        def fadd(a, b):
            s = _carry_exact_rows(a + b, L, passes=1)
            return cond_sub_2p(s, r2p)
        return fadd

    def mk_fsub(r2p, p2p1):
        def fsub(a, b):
            # a + (2p + 1) + (MASK - b) == a + 2p - b (mod R)
            cols = a + p2p1 + (LIMB_MASK - b)
            r = _carry_exact_rows(cols, L, passes=1)
            return cond_sub_2p(r, r2p)
        return fsub

    def _mm_reduce(t, t_scr, u_scr):
        """Montgomery reduction of loose full product columns t [2L, T]."""
        t_lo = t[:L, :]
        # m = (t mod R) * ninv mod R  (per-limb int constants)
        u_scr[...] = jnp.zeros_like(u_scr)
        for i in range(L):
            c = int(ninv_host[i])
            if c:
                u_scr[i:L, :] += jnp.uint32(c) * t_lo[: L - i, :]
        m = _carry_passes(u_scr[:L, :], 2)
        # u = t + m * p; exact carry; high limbs are the result
        u_scr[...] = t
        for i in range(L):
            c = int(p_host[i])
            if c:
                u_scr[i : i + L, :] += jnp.uint32(c) * m
        u = _carry_exact_rows(u_scr[...], 2 * L)
        return u[L:, :]

    def mm(a, b, t_scr, u_scr):
        """Montgomery product via the sublane-shift convolution; scratch
        refs are reused across sequential calls."""
        t_scr[...] = jnp.zeros_like(t_scr)
        for i in range(L):
            t_scr[i : i + L, :] += a[i : i + 1, :] * b
        t = _carry_passes(t_scr[...], 2)          # [2L, T] loose
        return _mm_reduce(t, t_scr, u_scr)

    def mk_mm_const(c_int: int):
        """Montgomery product by a fixed field constant (Montgomery
        form), with the constant's limbs baked as scalars — avoids
        [L, 1]-operand broadcasts Mosaic cannot lower."""
        c_limbs = [int(v) for v in
                   np.asarray(spec.to_mont_int(c_int)).reshape(L)]

        def mmc(b, t_scr, u_scr):
            t_scr[...] = jnp.zeros_like(t_scr)
            for i, c in enumerate(c_limbs):
                if c:
                    t_scr[i : i + L, :] += jnp.uint32(c) * b
            t = _carry_passes(t_scr[...], 2)
            return _mm_reduce(t, t_scr, u_scr)

        return mmc

    return mk_fadd, mk_fsub, mm, mk_mm_const


def _mk_add_kernel(spec: fl.FieldSpec, b3_int: int):
    L = spec.nlimbs
    mk_fadd, mk_fsub, mm_, mk_mm_const = _mk_field(spec)
    mm_b3 = mk_mm_const(b3_int)

    def kernel(cr, x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo,
               t_scr, u_scr):
        consts = cr[...]
        r2p = consts[0:L, :]
        fadd = mk_fadd(r2p)
        fsub = mk_fsub(r2p, consts[L : 2 * L, :])

        def mm(a, b):
            return mm_(a, b, t_scr, u_scr)

        def mmb3(b):
            return mm_b3(b, t_scr, u_scr)

        sq = lambda v: v.reshape(v.shape[-2:])
        X1, Y1, Z1 = sq(x1r[...]), sq(y1r[...]), sq(z1r[...])
        X2, Y2, Z2 = sq(x2r[...]), sq(y2r[...]), sq(z2r[...])

        # RCB Algorithm 7 (a = 0), mirrors group.CurveOps.add
        t0 = mm(X1, X2)
        t1 = mm(Y1, Y2)
        t2 = mm(Z1, Z2)
        t3 = mm(fadd(X1, Y1), fadd(X2, Y2))
        t3 = fsub(t3, fadd(t0, t1))
        t4 = mm(fadd(Y1, Z1), fadd(Y2, Z2))
        t4 = fsub(t4, fadd(t1, t2))
        X3 = mm(fadd(X1, Z1), fadd(X2, Z2))
        Y3 = fsub(X3, fadd(t0, t2))
        X3 = fadd(t0, t0)
        t0 = fadd(X3, t0)
        t2 = mmb3(t2)
        Z3 = fadd(t1, t2)
        t1 = fsub(t1, t2)
        Y3 = mmb3(Y3)
        X3 = mm(t4, Y3)
        t2_ = mm(t3, t1)
        X3 = fsub(t2_, X3)
        Y3 = mm(Y3, t0)
        t1 = mm(t1, Z3)
        Y3 = fadd(t1, Y3)
        t0 = mm(t0, t3)
        Z3 = mm(Z3, t4)
        Z3 = fadd(Z3, t0)
        xo[...] = X3.reshape(xo.shape)
        yo[...] = Y3.reshape(yo.shape)
        zo[...] = Z3.reshape(zo.shape)

    return kernel


def _mk_double_kernel(spec: fl.FieldSpec, b3_int: int):
    L = spec.nlimbs
    mk_fadd, mk_fsub, mm_, mk_mm_const = _mk_field(spec)
    mm_b3 = mk_mm_const(b3_int)

    def kernel(cr, xr, yr, zr, xo, yo, zo, t_scr, u_scr):
        consts = cr[...]
        r2p = consts[0:L, :]
        fadd = mk_fadd(r2p)
        fsub = mk_fsub(r2p, consts[L : 2 * L, :])

        def mm(a, b):
            return mm_(a, b, t_scr, u_scr)

        def mmb3(b):
            return mm_b3(b, t_scr, u_scr)

        sq = lambda v: v.reshape(v.shape[-2:])
        X, Y, Z = sq(xr[...]), sq(yr[...]), sq(zr[...])

        # RCB Algorithm 9 (a = 0), mirrors group.CurveOps.double
        t0 = mm(Y, Y)
        Z3 = fadd(t0, t0)
        Z3 = fadd(Z3, Z3)
        Z3 = fadd(Z3, Z3)
        t1 = mm(Y, Z)
        t2 = mm(Z, Z)
        t2 = mmb3(t2)
        X3 = mm(t2, Z3)
        Y3 = fadd(t0, t2)
        Z3 = mm(t1, Z3)
        t1 = fadd(t2, t2)
        t2 = fadd(t1, t2)
        t0 = fsub(t0, t2)
        Y3 = mm(t0, Y3)
        Y3 = fadd(X3, Y3)
        t1 = mm(X, Y)
        X3 = mm(t0, t1)
        X3 = fadd(X3, X3)
        xo[...] = X3.reshape(xo.shape)
        yo[...] = Y3.reshape(yo.shape)
        zo[...] = Z3.reshape(zo.shape)

    return kernel


@functools.lru_cache(None)
def _build(kind: str, p: int, nlimbs: int, b3_int: int, B: int, V: int,
           tile: int, three_d: bool):
    spec = fl.FieldSpec(p=p, nlimbs=nlimbs)
    L = nlimbs
    mk = _mk_add_kernel if kind == "add" else _mk_double_kernel
    kernel = mk(spec, b3_int)
    n_in = 6 if kind == "add" else 3
    if three_d:
        grid = (B, V // tile)
        bs = pl.BlockSpec((1, L, tile), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
        cs = pl.BlockSpec((2 * L, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
        out_sh = jax.ShapeDtypeStruct((B, L, V), jnp.uint32)
    else:
        grid = (V // tile,)
        bs = pl.BlockSpec((L, tile), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
        cs = pl.BlockSpec((2 * L, 1), lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
        out_sh = jax.ShapeDtypeStruct((L, V), jnp.uint32)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cs] + [bs] * n_in,
        out_specs=(bs, bs, bs),
        out_shape=(out_sh, out_sh, out_sh),
        scratch_shapes=[pltpu.VMEM((2 * L, tile), jnp.uint32),
                        pltpu.VMEM((2 * L, tile), jnp.uint32)],
        interpret=interpret,
    )


def _prep(spec, coords):
    """Broadcast/reshape a list of [..., L, V] coords to (B, L, Vp)."""
    coords = jnp.broadcast_arrays(*coords)
    shape = coords[0].shape
    L = spec.nlimbs
    V = shape[-1]
    lead = shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    tile = 128
    while tile * 2 <= min(V, _TILE):
        tile *= 2
    Vp = -(-V // tile) * tile
    out = []
    for c in coords:
        c3 = c.reshape((B, L, V)) if lead else c
        if Vp != V:
            c3 = jnp.pad(c3, [(0, 0)] * (c3.ndim - 1) + [(0, Vp - V)])
        out.append(c3)
    return out, shape, B, V, Vp, tile, bool(lead)


@functools.lru_cache(None)
def _const_pack(p: int, nlimbs: int, b3_int: int):
    """[2L, 1] host constant rows: R-2p | 2p+1 (b3 is baked into the
    kernel as scalar limbs)."""
    spec = fl.FieldSpec(p=p, nlimbs=nlimbs)
    return np.concatenate([
        fl.int_to_limbs(spec.R - 2 * p, nlimbs)[:, None],
        fl.int_to_limbs(2 * p + 1, nlimbs)[:, None],
    ], axis=0).astype(np.uint32)


def add_points(spec: fl.FieldSpec, b3_int: int, p1, p2):
    """Fused RCB complete addition; p1, p2 = (x, y, z) coord tuples."""
    coords, shape, B, V, Vp, tile, three_d = _prep(spec, list(p1) + list(p2))
    call = _build("add", spec.p, spec.nlimbs, b3_int, B, Vp, tile, three_d)
    cpack = _const_pack(spec.p, spec.nlimbs, b3_int)
    xs, ys, zs = call(cpack, *coords)
    out = []
    for o in (xs, ys, zs):
        if Vp != V:
            o = o[..., :V]
        out.append(o.reshape(shape))
    return tuple(out)


def double_point(spec: fl.FieldSpec, b3_int: int, p1):
    coords, shape, B, V, Vp, tile, three_d = _prep(spec, list(p1))
    call = _build("double", spec.p, spec.nlimbs, b3_int, B, Vp, tile,
                  three_d)
    cpack = _const_pack(spec.p, spec.nlimbs, b3_int)
    xs, ys, zs = call(cpack, *coords)
    out = []
    for o in (xs, ys, zs):
        if Vp != V:
            o = o[..., :V]
        out.append(o.reshape(shape))
    return tuple(out)
