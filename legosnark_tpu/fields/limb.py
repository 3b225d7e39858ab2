"""Vectorized multi-limb modular arithmetic for TPU.

This is the L0 compute substrate of the framework: the TPU-native
re-implementation of the role libff's Fp model plays for the reference
(`/root/reference/src/utils/globl.h:25-31` aliases `LFr`/`LG1`... onto
libff BN128 types; every hot loop in the reference bottoms out in
Montgomery field muls inside libff).

Design (TPU-first, not a translation):

* A field element batch is a ``uint32`` array of shape ``[..., L, V]``:
  little-endian 13-bit limbs on the SECOND-TO-LAST axis (the TPU
  sublane dimension — L=20 pads to 24 sublanes, 1.2x) and a batch
  "vector" axis on the LAST axis (the 128-wide lane dimension, which
  tiles exactly when V is a multiple of 128). A single element is
  ``[L, 1]``. Round 2 stored limbs on the minor axis, which padded
  every buffer 20 -> 128 lanes (6.4x HBM blowup, 16% lane utilization)
  and OOMed the 2^18 MSM benchmark; this layout is the fix.
* All operations are batched over arbitrary leading axes plus the
  trailing vector axis and are pure ``jnp`` programs (jit / vmap /
  shard_map compatible, no Python branches on data).
* 13-bit limbs are chosen so a full schoolbook product column
  (<= NLIMB products of 26 bits each) accumulates inside uint32 without
  overflow: NLIMB * (2^13-1)^2 < 2^31 for NLIMB <= 32. TPU has no
  64-bit integer units, so this keeps every op on the 32-bit VPU.
* Montgomery arithmetic with R = 2^(13*NLIMB). Carry normalization is
  branchless: magnitude-reduction passes shrink limbs, then a cummax
  carry-lookahead resolves residual carry chains exactly;
  multiplication intermediates use cheap "loose" carries
  (`_carry_loose`).
* Values live in the REDUNDANT domain [0, 2p) with canonical 13-bit
  limbs: add/sub/neg reduce modulo 2p, `mont_mul` output is < 1.1p,
  and only `canon` / `from_mont` / comparisons pay the final
  conditional subtract of p. This halves the XLA graph size of the
  group law, which dominates both compile time and VPU work.

Nothing here is specific to BN254; `FieldSpec` works for any odd
modulus below 13*NLIMB bits.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 13
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, nlimbs: int) -> np.ndarray:
    """Little-endian 13-bit limb decomposition of a Python int: [L]."""
    if x < 0:
        raise ValueError("negative")
    out = np.zeros((nlimbs,), dtype=np.uint32)
    for i in range(nlimbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("int does not fit in limbs")
    return out


def ints_to_limbs(xs, nlimbs: int) -> np.ndarray:
    """Batch of ints -> limb array [L, n] (canonical layout)."""
    return np.stack([int_to_limbs(int(x), nlimbs) for x in xs], axis=-1) \
        if len(xs) else np.zeros((nlimbs, 0), dtype=np.uint32)


def limbs_to_int(v) -> int:
    """Python int from a single little-endian limb vector [L] or [L, 1]."""
    v = np.asarray(v)
    if v.ndim == 2:
        assert v.shape[-1] == 1
        v = v[..., 0]
    x = 0
    for i in range(v.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(v[i])
    return x


def limbs_to_ints(v) -> np.ndarray:
    """Batched limbs [..., L, V] -> object array of ints [..., V]."""
    v = np.asarray(v)
    moved = np.moveaxis(v, -2, -1)  # [..., V, L]
    flat = moved.reshape(-1, moved.shape[-1])
    out = np.empty((flat.shape[0],), dtype=object)
    for i in range(flat.shape[0]):
        x = 0
        for j in range(flat.shape[1] - 1, -1, -1):
            x = (x << LIMB_BITS) | int(flat[i, j])
        out[i] = x
    return out.reshape(moved.shape[:-1])


@dataclass(frozen=True)
class FieldSpec:
    """Static (trace-time) description of a prime field."""

    p: int
    nlimbs: int
    name: str = "F"

    @property
    def bits(self) -> int:
        return self.p.bit_length()

    @property
    def R(self) -> int:
        return 1 << (LIMB_BITS * self.nlimbs)

    @functools.cached_property
    def R2(self) -> int:
        return (self.R * self.R) % self.p

    @functools.cached_property
    def ninv(self) -> int:
        # -p^{-1} mod R
        return (-pow(self.p, -1, self.R)) % self.R

    # --- constant limb arrays (host numpy, shape [L, 1]; become jnp
    # constants on trace and broadcast over the vector axis) -----------
    @functools.cached_property
    def p_limbs(self):
        return int_to_limbs(self.p, self.nlimbs)[:, None]

    @functools.cached_property
    def p_comp_limbs(self):
        # (R - 1) - p, used for branchless compare / subtract
        return int_to_limbs(self.R - 1 - self.p, self.nlimbs)[:, None]

    @functools.cached_property
    def p2_limbs(self):
        return int_to_limbs(2 * self.p, self.nlimbs)[:, None]

    @functools.cached_property
    def p2_comp_limbs(self):
        # (R - 1) - 2p, for the branchless redundant-domain reduction
        return int_to_limbs(self.R - 1 - 2 * self.p, self.nlimbs)[:, None]

    @functools.cached_property
    def r2_limbs(self):
        return int_to_limbs(self.R2, self.nlimbs)[:, None]

    @functools.cached_property
    def ninv_limbs(self):
        return int_to_limbs(self.ninv, self.nlimbs)[:, None]

    @functools.cached_property
    def one_mont(self):
        # R mod p == Montgomery form of 1
        return int_to_limbs(self.R % self.p, self.nlimbs)[:, None]

    @functools.cached_property
    def one_std(self):
        o = np.zeros((self.nlimbs, 1), dtype=np.uint32)
        o[0, 0] = 1
        return o

    @functools.cached_property
    def zero_limbs(self):
        return np.zeros((self.nlimbs, 1), dtype=np.uint32)

    def to_mont_int(self, x: int) -> np.ndarray:
        """Montgomery limbs [L, 1] of a Python int."""
        return int_to_limbs((x % self.p) * self.R % self.p,
                            self.nlimbs)[:, None]

    def to_mont_ints(self, xs) -> np.ndarray:
        """Batch ints -> Montgomery limbs [L, n]."""
        return ints_to_limbs([(int(x) % self.p) * self.R % self.p
                              for x in xs], self.nlimbs)

    def from_mont_limbs(self, v) -> int:
        return limbs_to_int(np.asarray(v)) * pow(self.R, -1, self.p) % self.p


# ---------------------------------------------------------------------------
# carry normalization (limb axis = -2 throughout)
# ---------------------------------------------------------------------------


def _shift_up(c):
    """[..., L, V] -> carry vector shifted one limb up (axis -2)."""
    pad = [(0, 0)] * (c.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(c[..., :-1, :], pad)


def _resize_limbs(x, nout: int):
    k = x.shape[-2]
    if k < nout:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, nout - k), (0, 0)]
        return jnp.pad(x, pad)
    if k > nout:
        # caller explicitly truncates (mod R)
        return x[..., :nout, :]
    return x


def _carry_exact(x, nout: int, passes: int = 2):
    """Exact branchless carry normalization.

    ``x``: uint32 columns [..., K, V], each < 2^31, little-endian over
    axis -2. Returns ``nout`` canonical 13-bit limbs; any carry out of
    the top limb is dropped (callers must size ``nout`` so the true
    value fits, except in intentionally mod-R contexts).

    ``passes`` magnitude passes shrink the limbs, then ONE cumulative
    max resolves the remaining carry chains exactly: the carry INTO
    limb i is 1 iff the nearest limb j <= i-1 that is not a propagator
    (limb==mask) is a generator (limb==2^13). Encode per limb
    t_j = 2j+1 (generate) | 2j (kill) | 0 (propagate) — cummax picks
    the nearest non-propagator below (higher j wins) and its parity
    says generate/kill. Exact whenever limbs entering it are
    <= 2^14 - 2: 2 passes guarantee that for any columns < 2^31;
    1 pass suffices for columns < 2^26 (the add/sub fast path).
    """
    x = _resize_limbs(x, nout)
    for _ in range(passes):
        x = (x & LIMB_MASK) + _shift_up(x >> LIMB_BITS)

    g = x >> LIMB_BITS                           # limb == 2^13 -> 1
    pr = x == LIMB_MASK                          # limb == mask -> propagate
    j2 = jnp.arange(2, 2 * nout + 2, 2, dtype=jnp.uint32)[:, None]
    t = jnp.where(pr, jnp.uint32(0), j2 + g)
    m = jax.lax.cummax(t, axis=x.ndim - 2)
    cin = _shift_up(m & 1)
    return (x + cin) & LIMB_MASK


def _carry_with_out(x, nout: int, passes: int = 2):
    """Like _carry_exact but also returns the 0/1 carry out of limb nout-1."""
    y = _carry_exact(x, nout + 1, passes=passes)
    return y[..., :nout, :], y[..., nout, :]


def _carry_loose(x, nout: int):
    """Cheap 2-pass carry: limbs land in [0, 2^13 + 63] (NOT canonical).

    Skips the exact tail of `_carry_exact` for intermediates that only
    feed another convolution. Loose limbs represent the same integer;
    conv columns stay safe: NLIMB * (2^13+63)^2 + 2^13 < 2^31 for
    NLIMB <= 20. This halves the HLO count of `mont_mul`, which
    dominates XLA compile time for every kernel in the framework.
    """
    x = _resize_limbs(x, nout)
    for _ in range(2):
        x = (x & LIMB_MASK) + _shift_up(x >> LIMB_BITS)
    return x


# ---------------------------------------------------------------------------
# limb-vector multiplication (schoolbook convolution)
# ---------------------------------------------------------------------------


@functools.lru_cache(None)
def _conv_tables(L: int, width: int):
    """Gather indices/mask realizing out[k] = sum_i a_i * b_{k-i} as ONE
    gather + multiply + reduce over the limb axis."""
    idx = np.zeros((L, width), dtype=np.int32)
    mask = np.zeros((L, width, 1), dtype=np.uint32)
    for i in range(L):
        for k in range(width):
            j = k - i
            if 0 <= j < L:
                idx[i, k] = j
                mask[i, k, 0] = 1
    return idx, mask


# "gather" compiles ~5-10x faster than "pad" on TPU (one gather +
# reduce vs 20 pad/add chains per conv) at comparable runtime; pad
# remains available for experiments.
_CONV_MODE = os.environ.get("LEGOSNARK_CONV", "gather")


def _conv_full(a, b):
    """Full product columns: out[..., k, :] = sum_{i+j=k} a_i * b_j.

    Inputs are canonical 13-bit limb arrays [..., L, V]; output
    [..., 2L-1, V], columns each < L * 2^26 < 2^31.

    Formulations (LEGOSNARK_CONV): "pad" — L shifted copies built by
    one sublane pad per term, summed (fusion-friendly); "gather" — one
    gather + broadcast-multiply + reduce.
    """
    L = a.shape[-2]
    if _CONV_MODE == "gather":
        idx, mask = _conv_tables(L, 2 * L - 1)
        B = jnp.take(b, _dev_const(idx), axis=-2) * _dev_const(mask)
        return jnp.sum(a[..., :, None, :] * B, axis=-3, dtype=jnp.uint32)
    out = jnp.zeros(a.shape[:-2] + (2 * L - 1,) + a.shape[-1:],
                    dtype=jnp.uint32)
    pad_cfg = [(0, 0)] * (a.ndim - 2)
    for i in range(L):
        term = a[..., i : i + 1, :] * b
        out = out + jnp.pad(term, pad_cfg + [(i, L - 1 - i), (0, 0)])
    return out


def _conv_lo(a, b, L: int):
    """Truncated product columns k < L (mod R context)."""
    if _CONV_MODE == "gather":
        idx, mask = _conv_tables(L, L)
        B = jnp.take(b, _dev_const(idx), axis=-2) * _dev_const(mask)
        return jnp.sum(a[..., :L, None, :] * B, axis=-3, dtype=jnp.uint32)
    out = jnp.zeros(a.shape[:-2] + (L,) + a.shape[-1:], dtype=jnp.uint32)
    pad_cfg = [(0, 0)] * (a.ndim - 2)
    for i in range(L):
        term = a[..., i : i + 1, :] * b[..., : L - i, :]
        out = out + jnp.pad(term, pad_cfg + [(i, 0), (0, 0)])
    return out


# ---------------------------------------------------------------------------
# Field ops (functions of (spec, arrays)); spec is static under jit
# ---------------------------------------------------------------------------


_CONST_CACHE: dict = {}


def _dev_const(arr):
    """HOST-side constant for use in traced expressions.

    Constants must stay numpy-backed on this stack: a device-resident
    jax.Array closed over by a jit gets its VALUE fetched back during
    MLIR lowering — through the axon TPU tunnel that fetch takes
    seconds to minutes PER CONSTANT (the round-3 "lowering hangs"
    pathology). A numpy constant is embedded straight from host
    memory. Under tracing, numpy operands are lifted to constants for
    free; eager use pays a transfer per op, which only cold paths do.
    """
    return np.asarray(arr)


def const_mont(spec: FieldSpec, x: int):
    """Value-keyed cached host constant: Montgomery form of x, [L, 1]."""
    key = ("cm", spec.p, int(x))
    hit = _CONST_CACHE.get(key)
    if hit is None:
        hit = spec.to_mont_int(int(x))
        _CONST_CACHE[key] = hit
    return hit


def _const(spec_arr, like):
    """Device constant [L, 1] broadcast-compatible with [..., L, V]."""
    return _dev_const(spec_arr)


@functools.lru_cache(None)
def _one_limb0_host(L: int):
    o = np.zeros((L, 1), dtype=np.uint32)
    o[0, 0] = 1
    return o


def _one_in_limb0(x):
    """[L, 1] constant with 1 in limb 0 (the +1 of a complement trick)."""
    return _dev_const(_one_limb0_host(x.shape[-2]))


def cond_sub_p(spec: FieldSpec, x):
    """x - p if x >= p else x  (x < 2p)."""
    L = spec.nlimbs
    s = x + _const(spec.p_comp_limbs, x) + _one_in_limb0(x)
    red, cout = _carry_with_out(s, L, passes=1)
    geq = (cout > 0)[..., None, :]
    return jnp.where(geq, red, x)


def cond_sub_2p(spec: FieldSpec, x):
    """x - 2p if x >= 2p else x  (x < 4p) — the redundant-domain
    reduction: every field op keeps values in [0, 2p) with canonical
    13-bit limbs; only `canon`/comparisons/serialization pay for the
    final conditional subtract of p."""
    L = spec.nlimbs
    s = x + _const(spec.p2_comp_limbs, x) + _one_in_limb0(x)
    red, cout = _carry_with_out(s, L, passes=1)
    geq = (cout > 0)[..., None, :]
    return jnp.where(geq, red, x)


def canon(spec: FieldSpec, x):
    """Canonical representative (< p) of a redundant-domain value < 4p.

    Accepts loose limbs (<= 2^13 + 63): the cond_sub carry chains
    normalize as a side effect. Two steps cover the Pallas group
    kernels' lazy-reduction outputs (< 3.62p, see curve/pallas_group)
    as well as the jnp-path [0, 2p) contract."""
    return cond_sub_p(spec, cond_sub_2p(spec, x))


def add(spec: FieldSpec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    # a, b < 2p: a+b < 4p < R, no top overflow; columns < 2^14 -> 1 pass
    s = _carry_exact(a + b, spec.nlimbs, passes=1)
    return cond_sub_2p(spec, s)


def neg(spec: FieldSpec, a):
    """2p - a for a in [0, 2p); maps 0 -> 2p, fixed by cond_sub_2p."""
    L = spec.nlimbs
    comp = _const(spec.p2_limbs, a) + (LIMB_MASK - a) + _one_in_limb0(a)
    # carry out of limb L-1 is guaranteed (2p >= a); drop it mod R
    r = _carry_exact(comp, L, passes=1)
    return cond_sub_2p(spec, r)


def sub(spec: FieldSpec, a, b):
    """a - b mod p in ONE carry chain via the complement trick:
    a + 2p + (R-1-b) + 1 mod R = a + 2p - b in (0, 4p), finished by
    cond_sub_2p (a, b in the redundant domain [0, 2p))."""
    a, b = jnp.broadcast_arrays(a, b)
    cols = (a + _const(spec.p2_limbs, a) + (LIMB_MASK - b)
            + _one_in_limb0(a))
    # columns <= 3*(2^13-1)+1 < 2^15: one pass; drop the guaranteed
    # carry out of the top limb (mod R)
    r = _carry_exact(cols, spec.nlimbs, passes=1)
    return cond_sub_2p(spec, r)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a*b*R^-1 mod p for a, b < 2p (canonical
    13-bit limbs); result < 1.1p — the ops form a stable redundant
    domain [0, 2p) and only `canon` pays for the final subtract.

    Magnitude audit (L = 20, 13-bit limbs): t = a*b < 4p^2 so
    t/R < 0.06p; the loose m representation has value m' < 1.01R so
    u = t + m'*p < (0.06 + 1.02)p*R < 2pR, and every convolution
    column stays under 20*(2^13+63)^2 + 2^13 < 2^31."""
    L = spec.nlimbs
    a, b = jnp.broadcast_arrays(a, b)
    # hot-path dispatch: the Pallas kernel does the same math with
    # sublane-shift convolutions (no gather expansion) when the vector
    # width justifies a kernel launch
    from . import pallas_limb
    if pallas_limb.enabled_for(a.shape[-1]):
        return pallas_limb.mont_mul(spec, a, b)
    # intermediate carries are LOOSE (limbs <= 2^13+63): only the final
    # normalization needs canonical limbs, and the column magnitudes
    # stay under 2^31 throughout (see _carry_loose)
    t = _carry_loose(_conv_full(a, b), 2 * L)          # a*b
    m = _carry_loose(_conv_lo(t[..., :L, :], _const(spec.ninv_limbs, t), L),
                     L)
    u = _conv_full(m, _const(spec.p_limbs, m))         # m*p columns
    pad = [(0, 0)] * (u.ndim - 2) + [(0, 1), (0, 0)]
    u = jnp.pad(u, pad) + t
    u = _carry_exact(u, 2 * L)                         # low L limbs == 0
    return u[..., L:, :]


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, x):
    return mont_mul(spec, x, _const(spec.r2_limbs, x))


def from_mont(spec: FieldSpec, x):
    """Montgomery -> CANONICAL standard form (< p): the output feeds
    MSM digit extraction and serialization, which read true bits."""
    return canon(spec, mont_mul(spec, x, _const(spec.one_std, x)))


def zero(spec: FieldSpec, shape=()):
    """Zero batch (HOST-backed; lifted to an embedded constant under
    tracing — see _dev_const). `shape` is the batch shape whose LAST
    axis is the vector axis; () means a single element [L, 1]."""
    return np.broadcast_to(spec.zero_limbs, _batched(spec, shape))


def one(spec: FieldSpec, shape=()):
    return np.broadcast_to(spec.one_mont, _batched(spec, shape))


def _batched(spec: FieldSpec, shape):
    shape = tuple(shape)
    if not shape:
        return (spec.nlimbs, 1)
    return shape[:-1] + (spec.nlimbs, shape[-1])


def is_zero(spec: FieldSpec, a):
    """Boolean mask [..., V]: the redundant domain represents 0 as 0 or p."""
    return jnp.all(canon(spec, a) == 0, axis=-2)


def eq(spec: FieldSpec, a, b):
    return jnp.all(canon(spec, a) == canon(spec, b), axis=-2)


def select(cond, a, b):
    """cond ? a : b with cond shaped [..., V] and a,b [..., L, V]."""
    return jnp.where(cond[..., None, :], a, b)


def mont_pow(spec: FieldSpec, a, e: int):
    """a^e for a static Python-int exponent.

    Square-and-multiply driven by a `lax.scan` over the (static) bit
    string: the compiled graph contains ONE sqr+mul body regardless of
    exponent length — unrolling 254 Montgomery muls would explode XLA
    compile time on the host.
    """
    if e == 0:
        return one(spec, a.shape[:-2] + a.shape[-1:])
    key = ("powbits", e)
    bits = _CONST_CACHE.get(key)
    if bits is None:
        bits = np.array([int(c) for c in bin(e)[3:]], dtype=np.uint32)
        _CONST_CACHE[key] = bits
    if bits.shape[0] == 0:
        return a

    def body(acc, bit):
        acc = mont_sqr(spec, acc)
        acc = select(jnp.broadcast_to(bit > 0, acc.shape[:-2] + acc.shape[-1:]),
                     mont_mul(spec, acc, a), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, a, bits)
    return acc


def inv(spec: FieldSpec, a):
    """Batched inverse via Fermat (a^(p-2)); inv(0) = 0."""
    return mont_pow(spec, a, spec.p - 2)


def batch_inv_scan(spec: FieldSpec, a):
    """Montgomery batch inversion over the VECTOR (last) axis (n
    elements, one field inv + 3n muls). Zeros map to zero. Sequential
    over n — use for moderate n on host-side paths; `inv` is the
    fully-parallel variant."""
    zmask = is_zero(spec, a)
    a_safe = select(zmask, one(spec, a.shape[:-2] + a.shape[-1:]), a)
    # scan over the vector axis: move it to front as [n, ..., L, 1]
    seq = jnp.moveaxis(a_safe, -1, 0)[..., None]

    def fwd(carry, x):
        nxt = mont_mul(spec, carry, x)
        return nxt, carry

    init = one(spec, a.shape[:-2] + (1,))
    total, prefixes = jax.lax.scan(fwd, init, seq)
    total_inv = inv(spec, total)

    def bwd(carry, xs):
        x, prefix = xs
        out = mont_mul(spec, carry, prefix)
        nxt = mont_mul(spec, carry, x)
        return nxt, out

    _, invs = jax.lax.scan(bwd, total_inv, (seq, prefixes), reverse=True)
    out = jnp.moveaxis(invs[..., 0], 0, -1)
    return select(zmask, zero(spec, a.shape[:-2] + a.shape[-1:]), out)


def get_window(spec: FieldSpec, x, start_bit: int, width: int):
    """Extract bits [start_bit, start_bit+width) of canonical limbs as
    uint32 [..., V]. width <= 19 (so every limb shift stays < 32 bits);
    a window may span up to three limbs."""
    assert width <= 32 - LIMB_BITS
    L = spec.nlimbs
    assert start_bit < L * LIMB_BITS, (
        f"window start {start_bit} beyond {L * LIMB_BITS}-bit scalars")
    out = None
    limb = start_bit // LIMB_BITS
    while limb < L and limb * LIMB_BITS < start_bit + width:
        shift = limb * LIMB_BITS - start_bit
        part = (x[..., limb, :] >> (-shift) if shift < 0
                else x[..., limb, :] << shift)
        out = part if out is None else (out | part)
        limb += 1
    return out & ((1 << width) - 1)


def num_windows(spec: FieldSpec, width: int) -> int:
    return -(-spec.bits // width)
