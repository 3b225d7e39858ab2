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


def _signed_digits(digits, c: int):
    """Unsigned base-2^c digits [W, n] -> signed-magnitude form
    (mag [W, n] in [0, 2^(c-1)], neg [W, n] bool) with digit value
    (-1)^neg * mag. Standard wNAF-style recoding: a digit above
    2^(c-1) becomes -(2^c - d) plus a carry into the next window.
    Negating a curve point is one field negation (y -> -y), so the
    bucket range HALVES: the Pippenger boundary phase runs over
    2^(c-1) buckets instead of 2^c-1, letting c grow one bit (fewer
    windows) at no boundary cost. Requires bits <= c*W - 1 so the
    final carry is absorbed by the top window (checked by the caller).
    """
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    mags, negs = [], []
    carry = jnp.zeros(digits.shape[1:], jnp.uint32)
    for j in range(digits.shape[0]):
        d = digits[j] + carry
        neg = d > half
        mags.append(jnp.where(neg, full - d, d))
        negs.append(neg)
        carry = neg.astype(jnp.uint32)
    return jnp.stack(mags), jnp.stack(negs)


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


def _joint_sort_boundaries(d, tcount: int, payload=None):
    """ONE sort serving both the by-digit point permutation and the
    `tcount` bucket-boundary positions (replaces argsort + a sort-based
    searchsorted — the searchsorted was a second full sort's worth of
    time per window). Point i gets key 2*d_i+1, query t gets key 2*t;
    in the joint order, query t lands exactly at (#points with digit
    < t) + (t-1), so idx[t-1] = joint_pos(t) - (t-1). Queries are
    identified by key parity, so no stability is required (bucket sums
    are order-independent within a digit).

    `payload` ([n] u32, default iota): co-sorted value returned as
    `order` — signed-digit windows pass 2*i + sign_i here so the
    transport gather indexes a doubled ±P table with NO extra
    per-window sign gather (the sort already moves an index payload;
    repurposing it is free).
    Returns (order [n], idx [tcount]); digits must lie in [0, tcount]."""
    n = d.shape[0]
    keys = jnp.concatenate([
        d.astype(jnp.uint32) * 2 + 1,
        jnp.arange(1, tcount + 1, dtype=jnp.uint32) * 2])
    if payload is None:
        payload = jnp.arange(n, dtype=jnp.uint32)
    pq = jnp.concatenate(
        [payload.astype(jnp.uint32), jnp.zeros(tcount, jnp.uint32)])
    skeys, spay = jax.lax.sort((keys, pq), num_keys=1, is_stable=False)
    isq = skeys % 2 == 0
    qpos = jnp.nonzero(isq, size=tcount)[0]
    idx = qpos - jnp.arange(tcount, dtype=qpos.dtype)
    ppos = jnp.nonzero(jnp.logical_not(isq), size=n)[0]
    order = spay[ppos]
    return order, idx


def _gathered_packed(points: Point, packed, order, G: int, w: int,
                     ncoord: int, h: int, L: int):
    """Gather the packed coords into the column-major [G, .., h, w]
    layout, one array per coordinate. `packed` is ('fused', arr) or
    ('percoord', [arrs])."""
    idx2d = jnp.transpose(order.reshape(w, G))              # [G, w]
    kind, data = packed
    if kind in ("pointmajor", "pointmajor2"):
        g = jnp.take(data, idx2d, axis=0)                   # [G, w, C*h]
        g = jnp.swapaxes(g, -1, -2)                         # [G, C*h, w]
        return [g[..., i * h : (i + 1) * h, :] for i in range(ncoord)]
    if kind == "fused":
        g = jnp.moveaxis(jnp.take(data, idx2d, axis=-1), -2, 0)
        return [g[..., i * h : (i + 1) * h, :] for i in range(ncoord)]
    return [jnp.moveaxis(jnp.take(a, idx2d, axis=-1), -2, 0)
            for a in data]


def _window_sum(C: CurveOps, points: Point, d, c: int,
                packed=None, affine: bool = False,
                neg=None, dmax: int | None = None) -> Point:
    """Sum_i d_i * P_i for digits d in [0, 2^c) — one Pippenger window.

    `neg` ([n] bool, optional): signed-digit mode — point i contributes
    with sign (-1)^neg_i (y negated after the per-window gather, one
    field negation). `dmax` overrides the max digit value (inclusive);
    signed windows pass 2^(c-1) so the boundary phase runs over half
    the buckets.

    Sort-by-digit + suffix-sum identity: sum_b b*B_b = sum_{t=1}^{2^c-1}
    (sum of points with digit >= t). The suffix sums run COLUMN-MAJOR:
    the sorted batch is laid out [G, .., L, w] with lane column q
    holding sorted positions q*G + r down the LEADING axis. Sorted rows
    are PAIR-REDUCED first (n/2 adds), the suffix scan runs over the
    G/2 pair rows (2 * n/2 adds), and odd boundary rows are fixed up
    with one masked add of the original sorted point — 1.5n group adds
    per window instead of the 2n a full-row scan costs. Cross-column
    carries (the exclusive lane-suffix of the w column totals) are
    added only at the 2^c-1 bucket-boundary gathers.

    affine=True: caller guarantees every point with a nonzero scalar
    has z == 1 (no identities); the z coordinate is neither packed nor
    gathered — 1/3 less transport.
    """
    n = d.shape[0]
    tcount = dmax if dmax is not None else (1 << c) - 1
    table_signed = (neg is not None and packed is not None
                    and packed[0] == "pointmajor2")
    payload = None
    if table_signed:
        payload = (jnp.arange(n, dtype=jnp.uint32) * 2
                   + neg.astype(jnp.uint32))
    order, idx = _joint_sort_boundaries(d, tcount, payload)
    safe = jnp.minimum(idx, n - 1)

    w = _SCAN_LANES
    G = n // w if n % w == 0 else 0
    if G < 8 or G % 2:
        # small-n fallback: single lane-axis scan
        ps = point_index(points, order)
        if affine:
            ps = Point(ps.x, ps.y, _ones_like_coord(C, ps.x))
        if neg is not None:
            ps = C.select(neg[order], C.neg(ps), ps)
        suf = _suffix_scan(C, ps)
        q = point_index(suf, safe)
    else:
        L = points.x.shape[-2]
        h = -(-L // 2)
        ncoord = 2 if affine else 3
        if packed is None:
            # standalone call: unsigned table; an explicit `neg` is
            # handled by the sign-select fallback below
            packed = _pack_points(C, points, n, affine)
        gs = _gathered_packed(points, packed, order, G, w, ncoord, h, L)
        coords = [_unpack16(g, L) for g in gs]              # [G,..,L,w]
        if neg is not None and not table_signed:
            # non-pointmajor fallback (G2): explicit sign gather+select.
            # Costs a full per-window index gather — the pointmajor2
            # doubled-table path above avoids it entirely.
            sgn2d = neg[jnp.transpose(order.reshape(w, G))]  # [G, w]
            # fl.select takes cond [..., V] vs coords [G, .., L, w]:
            # unit axes between G and w cover any point-batch dims (G2)
            cond = sgn2d[:, *([None] * (coords[1].ndim - 3)), :]
            coords[1] = C.F.select(cond, C.F.neg(coords[1]), coords[1])
        if affine:
            coords.append(_ones_like_coord(C, coords[0]))
        ps = Point(*coords)

        # pair pre-reduce, then scan over the G/2 pair rows
        pair = C.add(point_map(lambda a: a[0::2], ps),
                     point_map(lambda a: a[1::2], ps))      # [G/2,..,w]
        loc2 = jax.lax.associative_scan(C.add, pair, reverse=True, axis=0)
        # column totals -> exclusive lane-suffix (w lanes: small)
        tot = point_map(lambda x: x[0], loc2)               # [.., L, w]
        stot = _suffix_scan(C, tot)
        tex = point_map(
            lambda s, i: jnp.concatenate([s[..., 1:], i], axis=-1),
            stot, C.identity((1,)))

        r = safe % G
        col = safe // G
        # suffix at row r of col q = loc2[(r+1)//2, q]  (+ ps[r, q] when
        # r is odd; loc2[G/2] := identity for the last odd row)
        idrow = C.identity(())
        loc2p = point_map(
            lambda a, i: jnp.concatenate(
                [a, jnp.broadcast_to(i, a.shape[1:])[None]], axis=0),
            loc2, idrow)
        lp = _pack_cat(loc2p)                               # [G/2+1,..,3h,w]
        lflat = jnp.moveaxis(lp, 0, -2).reshape(
            lp.shape[1:-2] + (3 * h, (G // 2 + 1) * w))
        bp = jnp.take(lflat, ((r + 1) // 2) * w + col, axis=-1)
        base = Point(*(_unpack16(bp[..., i * h : (i + 1) * h, :], L)
                       for i in range(3)))
        # odd-row fixup from the packed gathered copy
        flat_ix = r * w + col
        ex = [jnp.take(
            jnp.moveaxis(g, 0, -2).reshape(g.shape[1:-2] + (h, n)),
            flat_ix, axis=-1) for g in gs]
        exc = [_unpack16(e, L) for e in ex]
        if neg is not None and not table_signed:
            sgn_at = sgn2d.reshape(-1)[flat_ix]             # [tcount]
            exc[1] = C.F.select(sgn_at, C.F.neg(exc[1]), exc[1])
        if affine:
            exc.append(_ones_like_coord(C, exc[0]))
        extra = C.select(r % 2 == 1, Point(*exc), C.identity((tcount,)))
        q = C.add(C.add(base, extra), point_index(tex, col))

    q = C.select(idx < n, q, C.identity((tcount,)))
    return C.sum_reduce(q)


def _ones_like_coord(C: CurveOps, x):
    """A z == 1 coordinate plane broadcast to x's shape."""
    one = C.F.one(())
    return jnp.broadcast_to(one, x.shape[:-2] + one.shape[-2:-1] + x.shape[-1:])


def _pack_points(C: CurveOps, points: Point, n: int, affine: bool,
                 signed: bool = False):
    """Shared packed transport coords for all windows' gathers.

    Default ("auto") layout for plain [L, n] coords (G1) is POINT-MAJOR
    fused: one [n, ncoord*h] array, so each gathered point reads
    ncoord*h CONTIGUOUS u32 words instead of ncoord*h rows strided 4n
    bytes apart in HBM. Measured at 2^20 (scripts/probe_gather.py):
    35.5ms vs 42.1ms per window for the lane-axis per-coord gather.
    Override with LEGOSNARK_MSM_TRANSPORT=fused|percoord|pointmajor.

    signed=True (point-major only): the table holds BOTH signs
    interleaved — row 2i is P_i, row 2i+1 is -P_i — so signed-digit
    windows gather index 2i+sign directly (sign resolved by the sort
    payload, zero per-window cost). Built once per MSM; one field
    negation + a 2x HBM copy."""
    coords = [points.x, points.y] if affine else list(points)
    mode = os.environ.get("LEGOSNARK_MSM_TRANSPORT", "auto")
    if mode in ("pointmajor", "auto") and coords[0].ndim == 2:
        pm = jnp.concatenate([jnp.transpose(_pack16(a))
                              for a in coords], axis=-1)      # [n, C*h]
        if not signed:
            return ("pointmajor", pm)
        ncoords = list(coords)
        ncoords[1] = C.F.neg(coords[1])
        nm = jnp.concatenate([jnp.transpose(_pack16(a))
                              for a in ncoords], axis=-1)
        return ("pointmajor2",
                jnp.stack([pm, nm], axis=1).reshape(2 * n, pm.shape[-1]))
    if mode != "percoord" and (n <= _FUSE_GATHER_MAX or mode == "fused"):
        return ("fused",
                jnp.concatenate([_pack16(a) for a in coords], axis=-2))
    return ("percoord", [_pack16(a) for a in coords])


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
        fr_spec: fl.FieldSpec = bn254.FR,
        points_affine: bool = False) -> Point:
    """Variable-base MSM: sum_i scalars_i * points_i.

    `scalars`: canonical Fr limbs [L, n]. `points`: Point batch [.., n].
    Returns a single projective Point ([L, 1] coords). Fully jittable;
    static shapes. Window size defaults to `config.default_window(n)`
    (override with the LEGOSNARK_MSM_C env var — tests use a small
    window so the bucket phase stays cheap on the CPU mesh).

    points_affine=True: caller guarantees z == 1 for every point whose
    scalar is nonzero (use `group.to_affine_batch`; identity/padding
    points are fine IF their scalars are zero — they die in the digit-0
    bucket). Drops the z plane from all per-window transport.
    """
    if c is None:
        from .. import config
        env = os.environ.get("LEGOSNARK_MSM_C")
        c = int(env) if env else config.default_window(scalars.shape[-1])
    assert 1 <= c <= 32 - fl.LIMB_BITS  # get_window shift bound
    n = scalars.shape[-1]
    digits = _all_digits(fr_spec, scalars, c)  # [W, n]
    W = digits.shape[0]
    # signed-digit recoding (default on): halves the bucket range so
    # the boundary phase costs what an UNSIGNED (c-1)-bit window pays,
    # making c = 17 (15 windows) the 2^20 sweet spot instead of c = 16
    # (16 windows). Requires the top window to absorb the final carry.
    use_signed = (os.environ.get("LEGOSNARK_MSM_SIGNED", "1") != "0"
                  and fr_spec.bits <= c * W - 1)

    # all windows batched (mapped in memory-bounded chunks): the sorts,
    # scans and bucket trees run n-wide; transport coords are packed
    # once (two 16-bit limb halves per word) for all windows' gathers
    G = n // _SCAN_LANES if n % _SCAN_LANES == 0 else 0
    use_cm = G >= 8 and G % 2 == 0
    packed = (_pack_points(C, points, n, points_affine, signed=use_signed)
              if use_cm else None)
    window_fn = functools.partial(_window_sum, C, points, c=c,
                                  packed=packed, affine=points_affine)
    chunk = _window_chunk(n, W)
    if use_signed:
        mags, negs = _signed_digits(digits, c)
        S = jax.lax.map(
            lambda mn: window_fn(mn[0], neg=mn[1], dmax=1 << (c - 1)),
            (mags, negs), batch_size=None if chunk == 1 else chunk)
    else:
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
