"""Fused Pallas kernels for the G1 group law (RCB complete add/double).

One `pallas_call` per group operation instead of 12 separate Montgomery
multiplies: all intermediates live in VMEM/registers, HBM traffic drops
to reading two points + writing one, and — critically on the tunneled
compile path — the MSM graph contains ~12x fewer kernel instances,
which is what makes the 2^18+ windowed-MSM program compile in minutes
instead of hours.

v2: LAZY REDUCTION. The v1 kernel normalized every field op to exact
13-bit limbs in [0, 2p) — paying a Kogge-Stone carry-resolution ladder
plus a conditional subtract ~43 times per point-add. With 13-bit limbs
(L = 20, R = 2^260, R/p ~ 84) none of that is necessary inside one
group op:

  * Values are tracked as multiples of p. A Montgomery product of
    a < j*p and b < k*p returns < p*(0.0118*jk + 1.004); the RCB
    sequences below keep every product jk <= 53 (fixed point of the
    bound recursion: mm outputs m ~ 1.62p, kernel outputs <= 3.62p),
    so outputs stay < 2p and the domain is closed WITHOUT conditional
    subtracts.
  * Limbs are LOOSE (<= 2^13 + 21 after two magnitude passes): a
    convolution of two loose operands peaks at 20*(2^13+21)^2 < 2^31,
    so u32 columns never overflow and the exact-carry ladder is not
    needed between ops.
  * Montgomery's division by R with loose limbs: the low L limbs of
    t + m*p sum to a value that is = 0 (mod R) and < 1.003*R, hence
    EXACTLY 0 or R — one OR-reduce over the low rows recovers the
    missing carry into the high half.
  * fsub needs a canonical (mod R) result because its limb-complement
    trick adds an artifact of exactly 2R that truncation must remove:
    fsub_K(a, b) = carry_exact_L(a + D_K + (2^14-1 - b_i)) with
    D_K = K*p + 2 - S (S = sum 2^13i) makes the total
    (a - b + K*p) + 2R in [2R, 3R), and an exact carry to L canonical
    limbs computes the total mod R = a - b + K*p deterministically.
    K is chosen per call site from the subtrahend's bound.

Kernel output contract: for vector widths > 128 lanes, coordinates are
loose-limbed with values < 3.62p (consumed only by further kernel ops:
MSM scans, table builds). Widths <= 128 (every verifier-scale/single
point: Horner tails, sum_reduce roots) are normalized to exact limbs in
[0, 2p), the jnp-path contract — so points escaping to limb.py
arithmetic (pairings, serialization, sub/neg) are always canonical.

Field math layout matches fields/limb.py (13-bit limbs on sublanes).
G1 only (Fq base field); G2 stays on the jnp path — its call sites are
keygen-scale, not the prover hot loop.
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
_MIN_V = 1
#: widths <= this get exact [0, 2p) outputs (the jnp-path contract)
_NORM_MAX = int(os.environ.get("LEGOSNARK_PALLAS_NORM", "128"))


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
    # ALL widths go through the kernel on TPU: narrow launches are
    # latency-noise, while mixing jnp-path ops into loose-limbed
    # kernel outputs would violate limb.py's [0, 2p)-exact contract
    return on_tpu and v >= _MIN_V


def _shift_up(c):
    pad = [(0, 0)] * (c.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(c[..., :-1, :], pad)


def _carry_loose(x, passes: int = 2):
    """Magnitude passes only: limbs land in [0, 2^13 + 21] for columns
    < 2^31 (NOT canonical; represents the same value mod R^... with
    top-row carries dropped — callers guarantee the value fits)."""
    for _ in range(passes):
        x = (x & LIMB_MASK) + _shift_up(x >> LIMB_BITS)
    return x


def _carry_exact_rows(x, nout: int, passes: int = 2):
    """Exact canonical limbs of (x mod R') where R' = 2^(13*nout):
    magnitude passes then one Kogge-Stone carry-resolution (precondition
    limbs <= 2^14 - 2 after the passes)."""
    k = x.shape[-2]
    if k < nout:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, nout - k), (0, 0)])
    elif k > nout:
        x = x[..., :nout, :]
    x = _carry_loose(x, passes)
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


def _conv_const_mxu(x, lo_w, hi_w):
    """Toeplitz-constant convolution of loose limbs [L, T] on the MXU:
    both the constant matrix and the variable operand split into
    7-bit int8 pieces, contracted with exact int32 accumulation, and
    recombined with two shifts. x limbs < 2^14; weight rows give the
    output column count."""
    x32 = x.astype(jnp.int32)
    x_lo = (x32 & 0x7F).astype(jnp.int8)
    x_hi = (x32 >> 7).astype(jnp.int8)

    def doti(w, v):
        return jax.lax.dot_general(
            w, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    s0 = doti(lo_w, x_lo)
    s1 = doti(lo_w, x_hi) + doti(hi_w, x_lo)
    s2 = doti(hi_w, x_hi)
    return (s0.astype(jnp.uint32)
            + (s1.astype(jnp.uint32) << 7)
            + (s2.astype(jnp.uint32) << 14))


def _mk_field(spec: fl.FieldSpec):
    """In-kernel lazy field helpers. Only Python-int per-limb constants
    are closed over; the [L, 1]-shaped constant rows (R-2p and the
    fsub offsets D_2/D_4/D_6) arrive via a packed u32 `consts` input,
    and the Montgomery-reduction Toeplitz weights (ninv, p, b3) via a
    packed int8 `weights` input (see `_weight_pack`)."""
    L = spec.nlimbs

    def fadd(a, b):
        # loose + loose: columns <= 2^14+42; one pass -> limbs <= 2^13+3
        return _carry_loose(a + b, passes=1)

    def mk_fsub(dk):
        def fsub(a, b):
            # a - b + K*p via the complement against 2^14-1 (safe for
            # loose b up to 2^13+21); the 2R artifact is removed by the
            # exact mod-R carry — see module docstring
            cols = a + dk + ((1 << (LIMB_BITS + 1)) - 1 - b)
            return _carry_exact_rows(cols, L, passes=1)
        return fsub

    def _mm_reduce(t, w):
        """Montgomery reduction of loose product columns t [2L, T] via
        two MXU Toeplitz matmuls: returns loose high limbs of
        (t + m*p)/R including the low-half carry (low rows sum to
        exactly 0 or R)."""
        t_lo = t[:L, :]
        # m = (t mod R) * ninv mod R (truncated conv; loose is fine —
        # any m' = m (mod R) works, dropped carries are multiples of R)
        m = _carry_loose(_conv_const_mxu(t_lo, w["n_lo"], w["n_hi"]))
        # u = t + m * p (columns < 2^31); two magnitude passes
        u = _carry_loose(t + _conv_const_mxu(m, w["p_lo"], w["p_hi"]))
        # low-half value is exactly 0 or R: carry = any(low != 0)
        # (reduce in int32 — unsigned max does not legalize in Mosaic)
        lo_nz = (jnp.max(u[:L, :].astype(jnp.int32), axis=-2,
                         keepdims=True) > 0).astype(jnp.uint32)
        hi = u[L:, :]
        return jnp.concatenate([hi[:1, :] + lo_nz, hi[1:, :]], axis=-2)

    def mm(a, b, t_scr, w):
        """Montgomery product: the variable*variable limb convolution
        runs as the sublane-shift scratch loop (VPU), the two constant
        reduction convolutions on the MXU. Loose in / loose out; value
        bound p*(0.0118*jk + 1.004) for a < jp, b < kp."""
        t_scr[...] = jnp.zeros_like(t_scr)
        for i in range(L):
            t_scr[i : i + L, :] += a[i : i + 1, :] * b
        t = _carry_loose(t_scr[...])
        return _mm_reduce(t, w)

    def mm_b3(b, t_scr, w):
        """Montgomery product by the curve constant b3: all three
        convolutions are constant-Toeplitz -> all on the MXU."""
        del t_scr
        t = _carry_loose(_conv_const_mxu(b, w["b3_lo"], w["b3_hi"]))
        return _mm_reduce(t, w)

    def mk_normalize(r2p):
        def normalize(x):
            """Exact limbs + single conditional subtract: [0, 3.62p)
            loose -> [0, 2p) canonical (the jnp-path contract)."""
            y = _carry_exact_rows(x, L, passes=1)
            s = y + r2p
            s = _carry_exact_rows(s, L + 1, passes=1)
            red, cout = s[:L, :], s[L, :]
            return jnp.where((cout > 0)[None, :], red, y)
        return normalize

    return fadd, mk_fsub, mm, mm_b3, mk_normalize


def _unpack_weights(wr, L: int):
    """Split the packed [10L, L] int8 weight input back into the four
    reduction matrices + two b3 matrices (see `_weight_pack`)."""
    w = wr[...]
    return {
        "n_lo": w[0:L, :], "n_hi": w[L : 2 * L, :],
        "p_lo": w[2 * L : 4 * L, :], "p_hi": w[4 * L : 6 * L, :],
        "b3_lo": w[6 * L : 8 * L, :], "b3_hi": w[8 * L : 10 * L, :],
    }


def _mk_add_kernel(spec: fl.FieldSpec, b3_int: int, norm: bool):
    L = spec.nlimbs
    fadd, mk_fsub, mm_, mm_b3_, mk_normalize = _mk_field(spec)

    def kernel(cr, wr, x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo,
               t_scr):
        consts = cr[...]
        w = _unpack_weights(wr, L)
        fsub4 = mk_fsub(consts[2 * L : 3 * L, :])
        fsub2 = mk_fsub(consts[L : 2 * L, :])

        def mm(a, b):
            return mm_(a, b, t_scr, w)

        def mmb3(b):
            return mm_b3_(b, t_scr, w)

        sq = lambda v: v.reshape(v.shape[-2:])
        X1, Y1, Z1 = sq(x1r[...]), sq(y1r[...]), sq(z1r[...])
        X2, Y2, Z2 = sq(x2r[...]), sq(y2r[...]), sq(z2r[...])

        # RCB Algorithm 7 (a = 0), mirrors group.CurveOps.add.
        # Value bounds (in multiples of p; inputs <= O = 3.62, mm
        # outputs <= m = 1.62): every mm product jk <= 4*O^2 = 53 < 64.
        t0 = mm(X1, X2)
        t1 = mm(Y1, Y2)
        t2 = mm(Z1, Z2)
        t3 = mm(fadd(X1, Y1), fadd(X2, Y2))
        t3 = fsub4(t3, fadd(t0, t1))          # <= m + 4
        t4 = mm(fadd(Y1, Z1), fadd(Y2, Z2))
        t4 = fsub4(t4, fadd(t1, t2))          # <= m + 4
        X3 = mm(fadd(X1, Z1), fadd(X2, Z2))
        Y3 = fsub4(X3, fadd(t0, t2))          # <= m + 4
        X3 = fadd(t0, t0)
        t0 = fadd(X3, t0)                     # <= 3m
        t2 = mmb3(t2)
        Z3 = fadd(t1, t2)                     # <= 2m
        t1 = fsub2(t1, t2)                    # <= m + 2
        Y3 = mmb3(Y3)                         # jk = m+4 = 5.6
        X3 = mm(t4, Y3)                       # jk = (m+4)*m = 9.1
        t2_ = mm(t3, t1)                      # jk = (m+4)(m+2) = 20.3
        X3 = fsub2(t2_, X3)                   # <= m + 2
        Y3 = mm(Y3, t0)                       # jk = m*3m = 7.9
        t1 = mm(t1, Z3)                       # jk = (m+2)*2m = 11.7
        Y3 = fadd(t1, Y3)                     # <= 2m
        t0 = mm(t0, t3)                       # jk = 3m*(m+4) = 27.3
        Z3 = mm(Z3, t4)                       # jk = 2m*(m+4) = 18.2
        Z3 = fadd(Z3, t0)                     # <= 2m
        if norm:
            normalize = mk_normalize(consts[0:L, :])
            X3, Y3, Z3 = normalize(X3), normalize(Y3), normalize(Z3)
        xo[...] = X3.reshape(xo.shape)
        yo[...] = Y3.reshape(yo.shape)
        zo[...] = Z3.reshape(zo.shape)

    return kernel


def _mk_double_kernel(spec: fl.FieldSpec, b3_int: int, norm: bool):
    L = spec.nlimbs
    fadd, mk_fsub, mm_, mm_b3_, mk_normalize = _mk_field(spec)

    def kernel(cr, wr, xr, yr, zr, xo, yo, zo, t_scr):
        consts = cr[...]
        w = _unpack_weights(wr, L)
        fsub6 = mk_fsub(consts[3 * L : 4 * L, :])

        def mm(a, b):
            return mm_(a, b, t_scr, w)

        def mmb3(b):
            return mm_b3_(b, t_scr, w)

        sq = lambda v: v.reshape(v.shape[-2:])
        X, Y, Z = sq(xr[...]), sq(yr[...]), sq(zr[...])

        # RCB Algorithm 9 (a = 0), mirrors group.CurveOps.double.
        # Bounds: inputs <= O = 3.62, mm outputs <= m = 1.62; peak
        # intermediate Z3 <= 8m = 13p (value-safe, << R/p = 84);
        # every mm product jk <= 8m^2 = 21 after t0's O^2 = 13.
        t0 = mm(Y, Y)
        Z3 = fadd(t0, t0)
        Z3 = fadd(Z3, Z3)
        Z3 = fadd(Z3, Z3)                     # <= 8m
        t1 = mm(Y, Z)
        t2 = mm(Z, Z)
        t2 = mmb3(t2)
        X3 = mm(t2, Z3)                       # jk = m*8m = 21
        Y3 = fadd(t0, t2)                     # <= 2m
        Z3 = mm(t1, Z3)                       # jk = m*8m = 21
        t1 = fadd(t2, t2)
        t2 = fadd(t1, t2)                     # <= 3m
        t0 = fsub6(t0, t2)                    # <= m + 6 (3m < 6)
        Y3 = mm(t0, Y3)                       # jk = (m+6)*2m = 24.7
        Y3 = fadd(X3, Y3)                     # <= 2m
        t1 = mm(X, Y)
        X3 = mm(t0, t1)                       # jk = (m+6)*m = 12.4
        X3 = fadd(X3, X3)                     # <= 2m
        if norm:
            normalize = mk_normalize(consts[0:L, :])
            X3, Y3, Z3 = normalize(X3), normalize(Y3), normalize(Z3)
        xo[...] = X3.reshape(xo.shape)
        yo[...] = Y3.reshape(yo.shape)
        zo[...] = Z3.reshape(zo.shape)

    return kernel


@functools.lru_cache(None)
def _build(kind: str, p: int, nlimbs: int, b3_int: int, B: int, V: int,
           tile: int, three_d: bool, norm: bool):
    spec = fl.FieldSpec(p=p, nlimbs=nlimbs)
    L = nlimbs
    mk = _mk_add_kernel if kind == "add" else _mk_double_kernel
    kernel = mk(spec, b3_int, norm)
    n_in = 6 if kind == "add" else 3
    if three_d:
        grid = (B, V // tile)
        bs = pl.BlockSpec((1, L, tile), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
        cs = pl.BlockSpec((4 * L, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
        ws = pl.BlockSpec((10 * L, L), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
        out_sh = jax.ShapeDtypeStruct((B, L, V), jnp.uint32)
    else:
        grid = (V // tile,)
        bs = pl.BlockSpec((L, tile), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
        cs = pl.BlockSpec((4 * L, 1), lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
        ws = pl.BlockSpec((10 * L, L), lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
        out_sh = jax.ShapeDtypeStruct((L, V), jnp.uint32)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cs, ws] + [bs] * n_in,
        out_specs=(bs, bs, bs),
        out_shape=(out_sh, out_sh, out_sh),
        scratch_shapes=[pltpu.VMEM((2 * L, tile), jnp.uint32)],
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
def _weight_pack(p: int, nlimbs: int, b3_int: int):
    """[10L, L] int8 Toeplitz weights for the MXU reduction matmuls:
    rows [0:L]=ninv_lo, [L:2L]=ninv_hi, [2L:4L]=p_lo, [4L:6L]=p_hi,
    [6L:8L]=b3_lo, [8L:10L]=b3_hi — each the 7-bit (lo) / high-bit
    (hi) split of the Toeplitz matrix T[k, i] = c[k - i]."""
    spec = fl.FieldSpec(p=p, nlimbs=nlimbs)
    L = nlimbs

    def toeplitz(c, rows):
        T = np.zeros((rows, L), dtype=np.int64)
        for k in range(rows):
            for i in range(L):
                if 0 <= k - i < len(c):
                    T[k, i] = c[k - i]
        return T

    N = toeplitz(np.asarray(spec.ninv_limbs).reshape(L), L)
    P = toeplitz(np.asarray(spec.p_limbs).reshape(L), 2 * L)
    B3 = toeplitz(np.asarray(spec.to_mont_int(b3_int)).reshape(L), 2 * L)
    parts = []
    for M in (N, P, B3):
        parts.append((M & 0x7F).astype(np.int8))
        parts.append((M >> 7).astype(np.int8))
    return np.concatenate(parts, axis=0)


@functools.lru_cache(None)
def _const_pack(p: int, nlimbs: int):
    """[4L, 1] host constant rows: R-2p | D_2 | D_4 | D_6, where
    D_K = K*p + 2 - S with S = sum_i 2^(13 i) — the fsub offsets that
    make the complement artifact exactly 2R (see module docstring)."""
    L = nlimbs
    S = ((1 << (fl.LIMB_BITS * L)) - 1) // ((1 << fl.LIMB_BITS) - 1)
    R = 1 << (fl.LIMB_BITS * L)
    rows = [fl.int_to_limbs(R - 2 * p, L)[:, None]]
    for K in (2, 4, 6):
        dk = K * p + 2 - S
        assert 0 < dk < R
        rows.append(fl.int_to_limbs(dk, L)[:, None])
    return np.concatenate(rows, axis=0).astype(np.uint32)


def add_points(spec: fl.FieldSpec, b3_int: int, p1, p2):
    """Fused RCB complete addition; p1, p2 = (x, y, z) coord tuples."""
    coords, shape, B, V, Vp, tile, three_d = _prep(spec, list(p1) + list(p2))
    norm = V <= _NORM_MAX
    call = _build("add", spec.p, spec.nlimbs, b3_int, B, Vp, tile,
                  three_d, norm)
    cpack = _const_pack(spec.p, spec.nlimbs)
    wpack = _weight_pack(spec.p, spec.nlimbs, b3_int)
    xs, ys, zs = call(cpack, wpack, *coords)
    out = []
    for o in (xs, ys, zs):
        if Vp != V:
            o = o[..., :V]
        out.append(o.reshape(shape))
    return tuple(out)


def double_point(spec: fl.FieldSpec, b3_int: int, p1):
    coords, shape, B, V, Vp, tile, three_d = _prep(spec, list(p1))
    norm = V <= _NORM_MAX
    call = _build("double", spec.p, spec.nlimbs, b3_int, B, Vp, tile,
                  three_d, norm)
    cpack = _const_pack(spec.p, spec.nlimbs)
    wpack = _weight_pack(spec.p, spec.nlimbs, b3_int)
    xs, ys, zs = call(cpack, wpack, *coords)
    out = []
    for o in (xs, ys, zs):
        if Vp != V:
            o = o[..., :V]
        out.append(o.reshape(shape))
    return tuple(out)
