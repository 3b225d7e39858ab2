"""Multi-scalar multiplication (MSM) — the north-star kernel.

TPU-native replacement for libff's Pippenger paths used by the
reference: `multiExp`/`multiExpMA` (`/root/reference/src/utils/globl.h:47-78`),
the sparse wrappers (`/root/reference/src/utils/sparsemexp.{h,cc}`) and
the fixed-base `simpleBatchExp`/window-table machinery
(`/root/reference/src/utils/util.h:119-134`,
`/root/reference/src/prototools/interp.h:36-59`).

Classic Pippenger accumulates each point into one of 2^c buckets per
window — a serial scatter-add, hostile to XLA. The TPU formulation here
replaces the bucket phase with *sort + suffix-scan*:

  for each window j (digit d_i of scalar k_i):
    1. sort points by digit                       (XLA sort, n log n u32)
    2. suffix sums  S[i] = sum_{t>=i} P_sorted[t] (associative_scan of the
       complete group law — log-depth, ~2n point-adds of vector work)
    3. window sum  = sum_{t=1}^{2^c-1} S[first index with digit >= t]
       — the standard identity  sum_b b*B_b = sum_t sum_{b>=t} B_b,
       realized as a searchsorted-gather plus a tree reduction.

Everything is branchless (complete addition handles identity/doubling
cases), statically shaped, and batched — jit/shard_map friendly. With
c = 13 a window is exactly one 13-bit limb of the scalar, so digit
extraction is a plain row read.

Layout: scalars are canonical (non-Montgomery) Fr limb arrays [L, n]
(limb axis sublane, point axis lane — see fields/limb.py); points are
projective `Point` batches with coords [L, n] (G1) / [2, L, n] (G2).
The same code serves G1 and G2 (the group law is generic over the
field ops).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..fields import limb as fl
from .group import Point, CurveOps, point_map
from . import bn254


def point_index(p: Point, idx) -> Point:
    """Gather points along the vector (last) axis."""
    return point_map(lambda a: jnp.take(a, idx, axis=-1), p)


def _num_windows(bits: int, c: int) -> int:
    return -(-bits // c)


def _all_digits(spec: fl.FieldSpec, scalars, c: int):
    """[W, n] uint32 digit matrix from canonical scalars [L, n]."""
    if c == fl.LIMB_BITS:
        return scalars  # one limb per window: rows ARE the digits
    # canonical scalars are < 2^spec.bits, so windows beyond the field
    # bit-length are identically zero — skip them (c=16 -> 16 windows
    # for a 254-bit field, not ceil(260/16))
    W = _num_windows(spec.bits, c)
    cols = [fl.get_window(spec, scalars, j * c, c) for j in range(W)]
    return jnp.stack(cols, axis=0)


def _pack16(a):
    """Pack limb pairs (k, k+L/2) into one u32 word: [..., L, V] ->
    [..., L/2, V]. Loose limbs are < 2^16, and the halves are
    CONTIGUOUS sublane slices (free), unlike even/odd interleaving.
    Halves the row count every per-window gather has to move."""
    L = a.shape[-2]
    h = (L + 1) // 2
    if L % 2:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 0)])
    return a[..., :h, :] | (a[..., h:, :] << 16)


def _unpack16(v, L: int):
    """Inverse of `_pack16`."""
    lo = v & jnp.uint32(0xFFFF)
    hi = v >> 16
    return jnp.concatenate([lo, hi], axis=-2)[..., :L, :]


def _pack_cat(p: Point):
    """All three coords packed and stacked on the limb axis:
    [..., 3*ceil(L/2), V] — one array so per-window gathers issue a
    single per-index gather for the whole point."""
    return jnp.concatenate([_pack16(a) for a in p], axis=-2)


#: fuse the 3 coords into ONE per-window gather up to this batch size.
#: Measured on v5e: fused wins at 2^18 (33 vs 40 ms gather+scan),
#: separate per-coord gathers win at 2^20 (75 vs 97 ms).
_FUSE_GATHER_MAX = int(os.environ.get("LEGOSNARK_MSM_FUSE_GATHER",
                                      str(1 << 18)))


def _window_sum(C: CurveOps, points: Point, d, c: int,
                packed: Point | None = None) -> Point:
    """Sum_i d_i * P_i for digits d in [0, 2^c) — one Pippenger window.

    Sort-by-digit + suffix-sum identity: sum_b b*B_b = sum_{t=1}^{2^c-1}
    (sum of points with digit >= t). The suffix sums run COLUMN-MAJOR:
    the sorted batch is laid out [G, .., L, w] with lane column q
    holding sorted positions q*G + r down the LEADING axis, and the
    suffix scan runs over axis 0. Every scan level then slices whole
    [L, w] tiles (major-axis strides, plain DMA) instead of stride-2
    lane shuffles — on TPU the lane-axis formulation spends several
    times the group-add cost on element shuffles per level. Cross-
    column carries (the exclusive lane-suffix of the w column totals)
    are added only at the 2^c-1 bucket-boundary gathers. Total group
    adds: 2n (column scans) + 2w (total scan) + 2^c (boundary carries).
    Bucket reduction is a c-level pairwise tree on contiguous halves.
    """
    n = d.shape[0]
    order = jnp.argsort(d)
    d_sorted = d[order]

    ts = jnp.arange(1, 1 << c, dtype=d_sorted.dtype)
    # method="sort" (merge-by-sorting): the default while-loop binary
    # search costs ~26ms per window at 2^20 on TPU; the sort-based
    # lowering is ~4x cheaper
    idx = jnp.searchsorted(d_sorted, ts, side="left", method="sort")
    safe = jnp.minimum(idx, n - 1)

    w = _SCAN_LANES
    if n % w or n // w < 8:
        # small-n fallback: single lane-axis scan
        ps = point_index(points, order)
        suf = _suffix_scan(C, ps)
        q = point_index(suf, safe)
    else:
        G = n // w
        L = points.x.shape[-2]
        h = -(-L // 2)
        fuse = n <= _FUSE_GATHER_MAX
        if packed is None:
            packed = (_pack_cat(points) if fuse
                      else point_map(_pack16, points))
        # gather straight into the column-major layout: fold the
        # (w, G) -> (G, w) transpose into the sort permutation; packed
        # rows halve the moved elements, and below _FUSE_GATHER_MAX all
        # three coords ride ONE per-index gather
        idx2d = jnp.transpose(order.reshape(w, G))          # [G, w]
        if fuse:
            g = jnp.moveaxis(jnp.take(packed, idx2d, axis=-1), -2, 0)
            ps = Point(*(_unpack16(g[..., i * h : (i + 1) * h, :], L)
                         for i in range(3)))                # [G,..,L,w]
        else:
            ps = point_map(
                lambda a: _unpack16(
                    jnp.moveaxis(jnp.take(a, idx2d, axis=-1), -2, 0), L),
                packed)
        loc = jax.lax.associative_scan(C.add, ps, reverse=True, axis=0)
        # column totals -> exclusive lane-suffix (w lanes: small)
        tot = point_map(lambda x: x[0], loc)                # [.., L, w]
        stot = _suffix_scan(C, tot)
        tex = point_map(
            lambda s, i: jnp.concatenate([s[..., 1:], i], axis=-1),
            stot, C.identity((1,)))
        # global suffix at sorted position i = loc[i % G, :, i // G]
        # + tex[i // G]; flatten+pack loc to ONE [.., 3h, n] array with
        # j = r*w + q and gather only the 2^c-1 boundary columns
        lp = _pack_cat(loc)                                 # [G,..,3h,w]
        lflat = jnp.moveaxis(lp, 0, -2).reshape(
            lp.shape[1:-2] + (3 * h, n))
        bp = jnp.take(lflat, (safe % G) * w + safe // G, axis=-1)
        bv = Point(*(_unpack16(bp[..., i * h : (i + 1) * h, :], L)
                     for i in range(3)))
        q = C.add(bv, point_index(tex, safe // G))

    q = C.select(idx < n, q, C.identity((ts.shape[0],)))
    return C.sum_reduce(q)


#: lane width of the column-major scan layout (columns per batch)
_SCAN_LANES = int(os.environ.get("LEGOSNARK_MSM_SCAN_LANES", str(1 << 10)))


def _suffix_scan(C: CurveOps, ps: Point) -> Point:
    """Inclusive suffix sums of a point batch along the vector axis
    (single-level; used for batches at most `_SUF_CHUNK` wide)."""
    return jax.lax.associative_scan(
        C.add, ps, reverse=True, axis=ps.x.ndim - 1)


def _window_chunk(n: int, W: int) -> int:
    """Windows per `lax.map` chunk. Windows run SEQUENTIALLY by default
    (batch 1): a single window is already n-wide vector work, so
    stacking windows buys no utilization but multiplies both live HBM
    (sorted copies + scan temps) and XLA compile time (the mapped body
    is inlined per batch element). Override with LEGOSNARK_MSM_WCHUNK
    for small-n experiments."""
    import os
    env = os.environ.get("LEGOSNARK_MSM_WCHUNK")
    if env:
        return max(1, min(W, int(env)))
    return 1


def msm(C: CurveOps, points: Point, scalars, c: int | None = None,
        fr_spec: fl.FieldSpec = bn254.FR) -> Point:
    """Variable-base MSM: sum_i scalars_i * points_i.

    `scalars`: canonical Fr limbs [L, n]. `points`: Point batch [.., n].
    Returns a single projective Point ([L, 1] coords). Fully jittable;
    static shapes. Window size defaults to `config.default_window(n)`
    (override with the LEGOSNARK_MSM_C env var — tests use a small
    window so the bucket phase stays cheap on the CPU mesh).
    """
    if c is None:
        from .. import config
        import os
        env = os.environ.get("LEGOSNARK_MSM_C")
        c = int(env) if env else config.default_window(scalars.shape[-1])
    assert 1 <= c <= 32 - fl.LIMB_BITS  # get_window shift bound
    n = scalars.shape[-1]
    digits = _all_digits(fr_spec, scalars, c)  # [W, n]
    W = digits.shape[0]

    # all windows batched (mapped in memory-bounded chunks): the sorts,
    # scans and bucket trees run n-wide; transport coords are packed
    # once (two 16-bit limb halves per word) for all windows' gathers
    use_cm = n % _SCAN_LANES == 0 and n // _SCAN_LANES >= 8
    packed = None
    if use_cm:
        packed = (_pack_cat(points) if n <= _FUSE_GATHER_MAX
                  else point_map(_pack16, points))
    window_fn = functools.partial(_window_sum, C, points, c=c,
                                  packed=packed)
    chunk = _window_chunk(n, W)
    S = jax.lax.map(window_fn, digits,
                    batch_size=None if chunk == 1 else chunk)
    # S: Point with coords [W, L, 1]

    # Horner combine from the most significant window down:
    # acc = ((S_{W-1} * 2^c + S_{W-2}) * 2^c + ...) + S_0
    S_rev = point_map(lambda x: x[::-1], S)

    def horner(acc, s):
        acc = jax.lax.fori_loop(0, c, lambda _, a: C.double(a), acc)
        return C.add(acc, s), None

    acc, _ = jax.lax.scan(horner, C.identity(()), S_rev)
    return acc


def msm_mont(C: CurveOps, points: Point, scalars_mont, c: int | None = None,
             fr_spec: fl.FieldSpec = bn254.FR) -> Point:
    """MSM with Montgomery-form Fr scalars (converts once, then `msm`)."""
    return msm(C, points, fl.from_mont(fr_spec, scalars_mont), c=c,
               fr_spec=fr_spec)


# ---------------------------------------------------------------------------
# Fixed-base batched scalar multiplication (keygen path)
# ---------------------------------------------------------------------------


def fixed_base_table(C: CurveOps, base: Point, c: int = 8,
                     bits: int = fl.LIMB_BITS * bn254.FR.nlimbs) -> Point:
    """Window table T[j, m] = m * 2^(c*j) * base, batch shape [W, 2^c].

    The TPU equivalent of libff's `get_window_table`
    (`/root/reference/src/utils/util.h:130`). Built once per base;
    reused by `batch_scalar_mul` for arbitrarily many scalars.
    """
    W = _num_windows(bits, c)

    # Q_j = 2^(c*j) * base, via c doublings per step of a scan
    def step(q, _):
        nxt = q
        for _ in range(c):
            nxt = C.double(nxt)
        return nxt, q

    _, Qs = jax.lax.scan(step, base, None, length=W)  # coords [W, .., L, 1]
    # -> batch shape (W,): coords [.., L, W]
    Qs = point_map(lambda x: jnp.moveaxis(x, 0, -1)[..., 0, :], Point(*Qs))

    # multiples m*Q_j for m = 1..2^c-1: a lax.scan that keeps a running
    # (W,)-batch of multiples (ONE traced add; 2^c-1 steps)
    def step2(carry, _):
        nxt = C.add(Point(*carry), Qs)
        return tuple(nxt), carry

    _, mults = jax.lax.scan(
        step2, tuple(C.add(C.identity((W,)), Qs)), None,
        length=(1 << c) - 1)
    # mults leaves: [2^c-1, .., L, W]; want batch (W, 2^c) = [W, .., L, 2^c]
    ident = C.identity((W, 1))

    # per leaf: [2^c-1, .., L, W] -> [W, .., L, 2^c-1]
    def to_table(m_leaf):
        m = jnp.moveaxis(m_leaf, 0, -1)       # [.., L, W, 2^c-1]
        m = jnp.moveaxis(m, -2, 0)            # [W, .., L, 2^c-1]
        return m

    mults_t = [to_table(m) for m in mults]
    return Point(*(jnp.concatenate([i, m], axis=-1)
                   for i, m in zip(ident, mults_t)))


def batch_scalar_mul(C: CurveOps, table: Point, scalars, c: int = 8,
                     fr_spec: fl.FieldSpec = bn254.FR) -> Point:
    """[k_i * base for each scalar] using a `fixed_base_table`.

    The TPU equivalent of libff `batch_exp`
    (`/root/reference/src/utils/util.h:131-133`): per scalar, gather one
    table point per window and tree-add the W windows — ~log2(W) group
    adds per scalar instead of ~2*254 for double-and-add.
    scalars: canonical [L, n]; returns Point batch [.., L, n].

    Large batches are processed in chunks (lax.map) so the [W, .., n]
    gathered-parts intermediate stays bounded (~W * chunk points live).
    """
    n = scalars.shape[-1]
    chunk = 1 << 14
    if n > chunk and n % chunk == 0:
        blocks = jnp.moveaxis(
            scalars.reshape(scalars.shape[:-1] + (n // chunk, chunk)),
            -2, 0)                                   # [n/chunk, L, chunk]
        out = jax.lax.map(
            lambda s: tuple(batch_scalar_mul(C, table, s, c=c,
                                             fr_spec=fr_spec)),
            blocks)
        # leaves [n/chunk, .., L, chunk] -> [.., L, n]
        return Point(*(
            jnp.moveaxis(o, 0, -2).reshape(o.shape[1:-1] + (n,))
            for o in out))

    digits = _all_digits(fr_spec, scalars, c)  # [W, n]
    W = digits.shape[0]
    assert W <= table.x.shape[0], "table too small for scalar bit-length"

    # parts[j] = table[j, digits[j]]: gather each table row by its digits
    parts = jax.vmap(point_index)(
        point_map(lambda x: x[:W], table), digits)  # [W, .., L, n]

    # tree-reduce over the window axis (leading)
    return tree_reduce_leading(C, parts)


def tree_reduce_leading(C: CurveOps, p: Point) -> Point:
    """Tree-sum over axis 0 keeping remaining batch axes."""
    n = p.x.shape[0]
    while n > 1:
        half = n // 2
        even = point_map(lambda x: x[0 : 2 * half : 2], p)
        odd = point_map(lambda x: x[1 : 2 * half : 2], p)
        s = C.add(even, odd)
        if n % 2:
            s = point_map(
                lambda a, b: jnp.concatenate([a, b[-1:]], 0), s, p)
        p = s
        n = (n + 1) // 2
    return point_map(lambda x: x[0], p)
