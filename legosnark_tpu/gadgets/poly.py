"""CPpoly — multilinear polynomial commitment (vSQL/PST13 style).

TPU-native, *sound* re-design of `CPPoly`
(`/root/reference/src/gadgets/poly.h`). The reference keeps the right
cost profile (d quotient folds, d (+d-1 "knowledge") MSMs, a pairing
ladder) but commits everything under generator bases "for benchmark
purposes only" (`poly.h:73,83-87,102`). Here the scheme is the real
PST13 construction:

  keygen(d):  secret s in Fr^d, alpha in Fr.
              level-j G1 bases  B_j[p] = eq(p, s_{j..d-1}) * G   (2^{d-j} pts)
              alpha-shifted     A_j[p] = alpha * eq(p, s_{j..d-1}) * G
              G2 elements       S_j = s_j * G2,  G2a = alpha * G2
  commit(v):  C = <B_0, v>, Ca = <A_0, v>   (two MSMs — same count as
              the reference's c/kc pair)
  prove(v,r): per round i: quotient table q_i = hi - lo (the same fold
              as `poly.h:56-67`), W_i = <B_{i+1}, q_i>, Wa_i = <A_{i+1}, q_i>
  verify:     e(C - ans*G, G2) * prod_i e(W_i, r_i*G2 - S_i) == 1
              plus knowledge checks e(W_i, G2a) == e(Wa_i, G2) and
              e(C, G2a) == e(Ca, G2)    (`poly.h:93-126` made sound)

The telescoping identity: with v^(i) = v folded by r_0..r_{i-1},
v~(s) - v~(r) = sum_i (s_i - r_i) * Q_i(s_{i+1..}) where
Q_i = v^(i)[x_i=1] - v^(i)[x_i=0] — exactly `w_coeffs` in the
reference's fold loop.

Variable convention matches prototools.mle (big-endian: variable i at
bit d-1-i of the table index; round i binds variable i, a contiguous
halving of the vector axis). Tables are [L, 2^d], points [L, d].

`d` is STATIC everywhere: it is recovered from the length of the
`bases` tuple (a Python-level pytree structure), never from a traced
array — `jax.jit(prove)` works directly on a PolyKey argument.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import (
    Point, G1, G2, FR_OPS, g1_generator, g2_generator, point_map,
)
from ..curve import msm as msm_mod
from ..prototools import mle
from ..utils import rand as lrand
from ..utils import util

FR = bn254.FR


class PolyKey(NamedTuple):
    bases: Tuple[Point, ...]     # level j in 0..d: [L, 2^(d-j)] G1 points
    bases_a: Tuple[Point, ...]   # alpha-shifted copies
    g2_s: Point                  # [2, L, d] G2: s_j * G2
    g2_alpha: Point              # alpha * G2
    g1: Point                    # generator
    g2: Point                    # generator


def poly_d(key: PolyKey) -> int:
    """Number of variables — static (tuple length), safe under jit."""
    return len(key.bases) - 1


class PolyComm(NamedTuple):
    c: Point    # <B_0, v>
    ca: Point   # alpha leg


class PolyPf(NamedTuple):
    witness: Point    # [L, d] G1  (W_i)
    witnessa: Point   # [L, d] G1  (alpha leg)


def proof_size_group_elements(d: int) -> dict:
    """Proof-size accounting (`poly.h:13-17` `PolyPf::getSize`)."""
    return {"g1": 2 * d, "g2": 0, "fr": 0}


def keygen(d: int, seed: int = 0) -> PolyKey:
    """Structured-reference-string generation (trusted setup: s, alpha
    are toxic waste, discarded on return). Uniform 254-bit sampling."""
    rng = np.random.default_rng(seed ^ 0x9057)
    s_ints = lrand.rand_fr_ints(rng, d)
    alpha_int = lrand.rand_fr_int(rng)
    s_mont = jnp.asarray(FR.to_mont_ints(s_ints)) if d else \
        jnp.zeros((FR.nlimbs, 0), jnp.uint32)
    alpha = jnp.asarray(FR.to_mont_int(alpha_int))

    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)

    # ONE fused fixed-base batch over every level's eq-table (plus the
    # alpha copies): 2(d+1) separate batch_scalar_mul calls would each
    # compile a distinct-shape graph — tens of minutes of XLA compiles
    # at d=20 on the tunneled backend; a single padded concat compiles
    # once and chunks internally
    def all_scalars(s_m, al):
        parts = []
        for j in range(d + 1):
            eqt = mle.mk_beta(s_m[..., j:])            # [L, 2^(d-j)] mont
            parts.append(eqt)
            parts.append(fl.mont_mul(FR, eqt, al))
        return fl.from_mont(FR, jnp.concatenate(parts, axis=-1))

    allv = jax.jit(all_scalars)(s_mont, alpha)
    total = allv.shape[-1]                             # 2*(2^(d+1)-1)
    chunk = 1 << 14
    pad = (-total) % chunk if total > chunk else 0
    if pad:
        allv = jnp.pad(allv, [(0, 0)] * (allv.ndim - 1) + [(0, pad)])
    pts = msm_mod.batch_scalar_mul(G1, table, allv, c=8)
    # normalize the G1 bases to affine (z == 1) once at keygen: every
    # commit/prove MSM then runs `points_affine=True` (z never packed,
    # gathered or scanned — the libff affine-bases trick)
    from ..curve.group import to_affine_batch
    pts = jax.jit(lambda p: to_affine_batch(G1, p))(pts)

    bases, bases_a = [], []
    off = 0
    for j in range(d + 1):
        m = 1 << (d - j)
        bases.append(point_map(
            lambda x, o=off, k=m: x[..., o : o + k], pts))
        off += m
        bases_a.append(point_map(
            lambda x, o=off, k=m: x[..., o : o + k], pts))
        off += m

    g2t = msm_mod.fixed_base_table(G2, g2_generator(), c=8)
    sa = jnp.concatenate(
        [fl.from_mont(FR, s_mont), fl.from_mont(FR, alpha)], axis=-1)
    g2_pts = msm_mod.batch_scalar_mul(G2, g2t, sa, c=8)
    g2_s = point_map(lambda x: x[..., :d], g2_pts)
    g2_alpha = point_map(lambda x: x[..., d : d + 1], g2_pts)

    return PolyKey(tuple(bases), tuple(bases_a), g2_s,
                   g2_alpha, g1_generator(), g2_generator())


def keygen_cached(d: int, seed: int = 0,
                  cache_dir: str | None = None) -> PolyKey:
    """`keygen` with a disk cache: the d=20 SRS costs minutes of
    fixed-base batch exponentiation; the reference treats keys as the
    expensive reusable artifact (`prototools/interp.h:36-59`) but never
    persists them — here a second invocation loads in seconds
    (utils.util.save_point_group / load_point_group)."""
    cache_dir = cache_dir or os.environ.get(
        "LEGOSNARK_SRS_CACHE", os.path.expanduser("~/.cache/legosnark_srs"))
    path = os.path.join(cache_dir, f"pst13_d{d}_s{seed}.npz")
    if os.path.exists(path):
        try:
            g = util.load_point_group(path)
            return PolyKey(
                bases=tuple(g[f"b{j:02d}"] for j in range(d + 1)),
                bases_a=tuple(g[f"a{j:02d}"] for j in range(d + 1)),
                g2_s=g["g2s"], g2_alpha=g["g2a"], g1=g["g1"], g2=g["g2"])
        except Exception:
            pass  # corrupt/stale cache: regenerate below
    key = keygen(d, seed)
    os.makedirs(cache_dir, exist_ok=True)
    group = {"g2s": key.g2_s, "g2a": key.g2_alpha,
             "g1": key.g1, "g2": key.g2}
    for j in range(d + 1):
        group[f"b{j:02d}"] = key.bases[j]
        group[f"a{j:02d}"] = key.bases_a[j]
    util.save_point_group(path, group)
    return key


def commit(key: PolyKey, v_mont) -> PolyComm:
    """Commit to the 2^d evaluation table (`poly.h:30-32`)."""
    v_can = fl.from_mont(FR, v_mont)
    return PolyComm(msm_mod.msm(G1, key.bases[0], v_can),
                    msm_mod.msm(G1, key.bases_a[0], v_can))


def compute_answer(key: PolyKey, v_mont, r_mont):
    """ans = v~(r) (`poly.h:39-43`); answer commitment ans*G."""
    ans = mle.eval_mle(v_mont, r_mont)
    return ans, G1.scalar_mul(key.g1, fl.from_mont(FR, ans))


def prove(key: PolyKey, v_mont, r_mont) -> PolyPf:
    """d quotient witnesses by successive folding (`poly.h:45-91`)."""
    d = poly_d(key)
    ws, was = [], []
    v = v_mont
    for i in range(d):
        half = v.shape[-1] // 2
        lo, hi = v[..., :half], v[..., half:]
        q = fl.sub(FR, hi, lo)               # Q_i eval table, 2^(d-i-1)
        q_can = fl.from_mont(FR, q)
        ws.append(msm_mod.msm(G1, key.bases[i + 1], q_can))
        was.append(msm_mod.msm(G1, key.bases_a[i + 1], q_can))
        v = mle.fold(v, r_mont[..., i : i + 1])
    from ..curve.pairing import point_concat
    return PolyPf(point_concat(ws), point_concat(was))


# ---------------------------------------------------------------------------
# Staged (per-shape-jitted) prover path
# ---------------------------------------------------------------------------
#
# `jax.jit(prove)` at d=20 inlines 2d distinct-shape MSM subgraphs into
# ONE program — tens of minutes of XLA compile for a single cold run
# (round-4 weak #2: 228s cppoly prove, ~97% compile). The staged path
# instead drives a Python-level loop of small jitted pieces whose
# compiled shapes are shared across levels (and with `commit_staged`):
# quotient tables are padded to a few bucketed sizes, so <= ~8 compiled
# MSM shapes serve all levels of every gadget (zero-padded scalars land
# in Pippenger's digit-0 bucket and contribute nothing).


def _bucket_size(m: int, d: int) -> int:
    """Padded MSM size for a level of m points: exact for the few big
    levels (>= 2^16), next power of FOUR below that (<= 2x work), with
    a floor so the many tiny levels share one shape."""
    floor = 1 << min(10, max(d - 1, 0))
    if m <= floor:
        return floor
    if m >= (1 << 16):
        return m
    lg = m.bit_length() - 1
    return m if lg % 2 == 0 else m * 2


@jax.jit
def _pair_msm(bases: Point, bases_a: Point, scalars_can):
    """The (W_i, Wa_i) leg pair over shared scalars. One jitted
    function — jit's shape cache makes every same-shape level reuse
    one compiled program; XLA CSEs the shared digit/sort work.
    PolyKey bases are affine by construction (keygen normalizes;
    identity pad points carry zero scalars)."""
    return (msm_mod.msm(G1, bases, scalars_can, points_affine=True),
            msm_mod.msm(G1, bases_a, scalars_can, points_affine=True))


@functools.partial(jax.jit, static_argnums=(3,))
def _pad_level(b: Point, ba: Point, q_can, m: int):
    """Pad a level's bases with identity points and its scalars with
    zeros up to the bucket size m (trivial-compile shims; the heavy
    compile lives in `_pair_msm` which only ever sees bucket shapes)."""
    n = q_can.shape[-1]
    if n == m:
        return b, ba, q_can
    idp = G1.identity((m - n,))
    pad_pts = lambda p: point_map(
        lambda a, i: jnp.concatenate(
            [a, jnp.broadcast_to(i, a.shape[:-1] + (m - n,))], axis=-1),
        p, idp)
    qp = jnp.pad(q_can, [(0, 0)] * (q_can.ndim - 1) + [(0, m - n)])
    return pad_pts(b), pad_pts(ba), qp


@jax.jit
def _all_quotients(v_mont, r_mont):
    """All d quotient tables (canonical form) in one jitted pass —
    the fold ladder of `poly.h:56-67` without the MSMs."""
    d = r_mont.shape[-1]
    qs = []
    v = v_mont
    for i in range(d):
        half = v.shape[-1] // 2
        qs.append(fl.from_mont(FR, fl.sub(FR, v[..., half:], v[..., :half])))
        v = mle.fold(v, r_mont[..., i : i + 1])
    return tuple(qs)


def prove_staged(key: PolyKey, v_mont, r_mont) -> PolyPf:
    """`prove` semantics, staged execution (call OUTSIDE jit)."""
    from ..curve.pairing import point_concat
    d = poly_d(key)
    qs = _all_quotients(v_mont, r_mont)
    ws, was = [], []
    for i, q in enumerate(qs):
        m = _bucket_size(q.shape[-1], d)
        b, ba, qp = _pad_level(key.bases[i + 1], key.bases_a[i + 1], q, m)
        w, wa = _pair_msm(b, ba, qp)
        ws.append(w)
        was.append(wa)
    return PolyPf(point_concat(ws), point_concat(was))


@jax.jit
def _from_mont_jit(v_mont):
    return fl.from_mont(FR, v_mont)


def commit_staged(key: PolyKey, v_mont) -> PolyComm:
    """`commit` via the shared `_pair_msm` shape cache."""
    c, ca = _pair_msm(key.bases[0], key.bases_a[0], _from_mont_jit(v_mont))
    return PolyComm(c, ca)


_answer_jit = jax.jit(lambda key, v, r: compute_answer(key, v, r))


def compute_answer_staged(key: PolyKey, v_mont, r_mont):
    return _answer_jit(key, v_mont, r_mont)


def check_commit(key: PolyKey, cm: PolyComm):
    """Knowledge well-formedness e(C, G2a) == e(Ca, G2)
    (`poly.h:34-36`)."""
    from ..curve import pairing as pr
    g1s = pr.point_concat([cm.c, G1.neg(cm.ca)])
    g2s = pr.point_concat([key.g2_alpha, key.g2])
    return pr.pairing_product_is_one(g1s, g2s)


def verify(key: PolyKey, cm: PolyComm, ans_commit: Point, r_mont,
           pf: PolyPf):
    """Pairing ladder (`poly.h:93-126`, sound version).

    Main equation as a single product-of-pairings == 1:
      e(ansC - C, G2) * prod_i e(W_i, S_i - r_i*G2) == 1
    Knowledge: for each i, e(W_i, G2a) == e(Wa_i, G2).
    """
    from ..curve import pairing as pr
    d = poly_d(key)
    r_can = fl.from_mont(FR, r_mont)

    # r_i * G2 points, batched over the vector axis [.., L, d]
    rg2 = G2.scalar_mul(g2_generator((d,)), r_can)
    # S_i - r_i*G2
    sr = G2.add(key.g2_s, G2.neg(rg2))

    # main: e(ansC - C, G2) * prod e(W_i, S_i - r_i G2) == 1
    diff = G1.add(ans_commit, G1.neg(cm.c))
    g1s = pr.point_concat([diff, pf.witness])
    g2s = pr.point_concat([key.g2, sr])
    main_ok = pr.pairing_product_is_one(g1s, g2s)

    # knowledge checks: batching prod_i e(W_i, G2a) e(-Wa_i, G2) == 1
    # would allow cancellation across i; check each i separately.
    g2p = pr.point_concat([key.g2_alpha, key.g2])            # [2, L, 2]
    if isinstance(pf.witness.x, jax.core.Tracer):
        # under jit: leading batch axis (2 pairings per i, vectorized)
        to_lead = lambda x: jnp.moveaxis(x, -1, 0)[..., None]
        w = point_map(to_lead, pf.witness)                   # [d, L, 1]
        nwa = G1.neg(point_map(to_lead, pf.witnessa))
        g1p = point_map(lambda a, b: jnp.concatenate([a, b], axis=-1),
                        w, nwa)                              # [d, L, 2]
        g2b = point_map(lambda x: jnp.broadcast_to(x, (d,) + x.shape), g2p)
        know_ok = pr.pairing_product_is_one(g1p, g2b)        # [d]
    else:
        # eager: per-i products share ONE compiled [L, 4] miller graph
        # across every d (compile time dominates these checks)
        kchecks = []
        for i in range(d):
            wi = point_map(lambda x: x[..., i : i + 1], pf.witness)
            nwi = G1.neg(point_map(lambda x: x[..., i : i + 1],
                                   pf.witnessa))
            g1p = pr.point_concat([wi, nwi])                 # [L, 2]
            kchecks.append(pr.pairing_product_is_one(g1p, g2p))
        know_ok = jnp.stack([jnp.all(k) for k in kchecks])
    return jnp.logical_and(jnp.all(main_ok), jnp.all(know_ok))


# Staged verifier entry points: run EAGERLY. The group-op glue
# dispatches op-by-op (small, shape-cached scans), while every pairing
# product inside routes through pairing.pairing_product_is_one's
# decomposed jitted pieces — one shared [L, 4]/[L, 16]/[L, 32] Miller
# graph + one final-exp graph serve every d (the round-4 cppoly-20var
# verify never finished compiling its monolithic inlined graph on TPU).
def check_commit_staged(key: PolyKey, cm: PolyComm):
    return check_commit(key, cm)


def verify_staged(key: PolyKey, cm: PolyComm, ans_commit: Point, r_mont,
                  pf: PolyPf):
    return verify(key, cm, ans_commit, r_mont, pf)
