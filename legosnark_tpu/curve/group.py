"""Branchless elliptic-curve group law for TPU (G1 and G2).

TPU-native replacement for libff's Jacobian add/double used throughout
the reference's MSM inner loops (SURVEY §2.2: "G1/G2 Jacobian point
add/double, mixed add"). Instead of translating libff's branchy Jacobian
code, we use the Renes–Costello–Batina *complete* addition formulas for
a=0 short-Weierstrass curves (eprint 2015/1060, Algorithms 7 & 9):
one straight-line formula handles generic adds, doublings and the
identity with zero data-dependent branches — exactly what a vector unit
wants. Identity is the projective point (0 : 1 : 0).

All functions are batched (leading axes + the trailing vector axis, see
fields/limb.py) and generic over the field via a `FieldOps` object, so
the same code drives G1 (Fq) and G2 (Fq2).
"""
from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..fields.ops import FqOps, Fq2Ops
from . import bn254


class Point(NamedTuple):
    """Homogeneous projective point (X : Y : Z); identity = (0:1:0)."""

    x: Any
    y: Any
    z: Any


def point_map(f, *ps: Point) -> Point:
    return Point(*(f(*xs) for xs in zip(*ps)))


def point_stack(ps, axis: int = 0) -> Point:
    """Stack a list of equal-shaped point batches on a new leading axis."""
    return Point(*(jnp.stack(list(xs), axis=axis) for xs in zip(*ps)))


class CurveOps:
    """Group-law ops for y^2 = x^3 + b over a FieldOps instance.

    `b`/`b3` must be HOST-backed constants (see limb._dev_const): they
    are closed over by every jitted group op, and device-resident
    closures hang MLIR lowering on tunneled backends. Pass `b3`
    explicitly (computed from ints) rather than letting an eager
    device add produce it."""

    def __init__(self, field, b, b3, b3_int=None):
        self.F = field
        self.b = b
        self.b3 = b3
        #: set for prime-base-field curves (G1): enables the fused
        #: Pallas add/double kernels on wide batches
        self.b3_int = b3_int

    def _pallas_ok(self, *coords):
        if self.b3_int is None:
            return False
        from . import pallas_group
        v = max(c.shape[-1] for c in coords)
        return pallas_group.enabled_for(v)

    # -- constructors ------------------------------------------------------
    def identity(self, shape=()) -> Point:
        F = self.F
        return Point(F.zero(shape), F.one(shape), F.zero(shape))

    def from_affine(self, x, y) -> Point:
        F = self.F
        return Point(x, y, F.one(F.batch_shape(x)))

    def is_identity(self, p: Point):
        return self.F.is_zero(p.z)

    # -- group law ---------------------------------------------------------
    def add(self, p: Point, q: Point) -> Point:
        """Complete addition (RCB Algorithm 7, a=0)."""
        if self._pallas_ok(p.x, q.x):
            from . import pallas_group
            return Point(*pallas_group.add_points(
                self.F.spec, self.b3_int, tuple(p), tuple(q)))
        F, b3 = self.F, self.b3
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        t0 = F.mul(X1, X2)
        t1 = F.mul(Y1, Y2)
        t2 = F.mul(Z1, Z2)
        t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        t3 = F.sub(t3, F.add(t0, t1))
        t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
        t4 = F.sub(t4, F.add(t1, t2))
        X3 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
        Y3 = F.sub(X3, F.add(t0, t2))
        X3 = F.add(t0, t0)
        t0 = F.add(X3, t0)
        t2 = F.mul(b3, t2)
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = F.mul(b3, Y3)
        X3 = F.mul(t4, Y3)
        t2_ = F.mul(t3, t1)
        X3 = F.sub(t2_, X3)
        Y3 = F.mul(Y3, t0)
        t1 = F.mul(t1, Z3)
        Y3 = F.add(t1, Y3)
        t0 = F.mul(t0, t3)
        Z3 = F.mul(Z3, t4)
        Z3 = F.add(Z3, t0)
        return Point(X3, Y3, Z3)

    def double(self, p: Point) -> Point:
        """Complete doubling (RCB Algorithm 9, a=0)."""
        if self._pallas_ok(p.x):
            from . import pallas_group
            return Point(*pallas_group.double_point(
                self.F.spec, self.b3_int, tuple(p)))
        F, b3 = self.F, self.b3
        X, Y, Z = p
        t0 = F.sqr(Y)
        Z3 = F.add(t0, t0)
        Z3 = F.add(Z3, Z3)
        Z3 = F.add(Z3, Z3)
        t1 = F.mul(Y, Z)
        t2 = F.sqr(Z)
        t2 = F.mul(b3, t2)
        X3 = F.mul(t2, Z3)
        Y3 = F.add(t0, t2)
        Z3 = F.mul(t1, Z3)
        t1 = F.add(t2, t2)
        t2 = F.add(t1, t2)
        t0 = F.sub(t0, t2)
        Y3 = F.mul(t0, Y3)
        Y3 = F.add(X3, Y3)
        t1 = F.mul(X, Y)
        X3 = F.mul(t0, t1)
        X3 = F.add(X3, X3)
        return Point(X3, Y3, Z3)

    def neg(self, p: Point) -> Point:
        return Point(p.x, self.F.neg(p.y), p.z)

    def select(self, c, p: Point, q: Point) -> Point:
        F = self.F
        return Point(F.select(c, p.x, q.x), F.select(c, p.y, q.y),
                     F.select(c, p.z, q.z))

    def eq(self, p: Point, q: Point):
        """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 — plus
        matching identity flags (identity only equals identity)."""
        F = self.F
        both_id = jnp.logical_and(self.is_identity(p), self.is_identity(q))
        none_id = jnp.logical_and(
            jnp.logical_not(self.is_identity(p)),
            jnp.logical_not(self.is_identity(q)))
        cross = jnp.logical_and(
            F.eq(F.mul(p.x, q.z), F.mul(q.x, p.z)),
            F.eq(F.mul(p.y, q.z), F.mul(q.y, p.z)))
        return jnp.logical_or(both_id, jnp.logical_and(none_id, cross))

    def on_curve(self, p: Point):
        """Projective curve equation Y^2 Z == X^3 + b Z^3 (holds for identity)."""
        F = self.F
        lhs = F.mul(F.sqr(p.y), p.z)
        rhs = F.add(F.mul(F.sqr(p.x), p.x), F.mul(self.b, F.mul(F.sqr(p.z), p.z)))
        return F.eq(lhs, rhs)

    def to_affine(self, p: Point):
        """Normalize; identity maps to (0, 0) plus an identity mask."""
        F = self.F
        zinv = F.inv(p.z)
        return F.mul(p.x, zinv), F.mul(p.y, zinv), self.is_identity(p)

    # -- scalar multiplication --------------------------------------------
    def scalar_mul(self, p: Point, k):
        """[k]P for k an Fr element in canonical (non-Montgomery) limb
        form [..., L, V]; batched. Double-and-add via lax.scan over all
        scalar bits (MSB first) — one add+double body compiled.

        The point and scalar batches broadcast against each other (a
        [L, 1] point against [L, m] scalars yields [.., L, m]); the
        scan carry must have the joint shape from step one, so the
        point is widened up front."""
        kb = k.shape[:-2] + k.shape[-1:]
        pb = self.F.batch_shape(p.x)
        joint = jnp.broadcast_shapes(pb, kb)
        if joint != pb:
            nd = self.F.ndim
            full = joint[:-1] + p.x.shape[-nd:-1] + joint[-1:]
            p = Point(*(jnp.broadcast_to(c, full) for c in p))
        nbits = fl.LIMB_BITS * bn254.FR.nlimbs
        # bit i of the scalar, MSB-first sequence
        def body(acc, i):
            bit_limb = jnp.take(k, (nbits - 1 - i) // fl.LIMB_BITS, axis=-2)
            bit = (bit_limb >> ((nbits - 1 - i) % fl.LIMB_BITS)) & 1
            acc = self.double(acc)
            cand = self.add(acc, p)
            acc = self.select(bit > 0, cand, acc)
            return acc, None

        init = self.identity(self.F.batch_shape(p.x))
        acc, _ = jax.lax.scan(body, init, jnp.arange(nbits))
        return acc

    # -- reductions --------------------------------------------------------
    def sum_reduce(self, p: Point) -> Point:
        """Tree-sum of a batch of points along the VECTOR (last) axis ->
        single point (V=1). Contiguous halving keeps lane slices
        aligned."""
        n = p.x.shape[-1]
        while n > 1:
            h = n // 2
            s = self.add(point_map(lambda a: a[..., :h], p),
                         point_map(lambda a: a[..., h : 2 * h], p))
            if n % 2:
                s = point_map(
                    lambda a, b: jnp.concatenate([a, b[..., -1:]], -1), s, p)
            p = s
            n = (n + 1) // 2
        return p


def _scan_prod(F, v, reverse: bool):
    """Inclusive prefix (or suffix) products over the lane axis,
    COLUMN-MAJOR for wide batches: a lane-axis associative_scan at
    2^18+ lanes hangs the tunneled TPU lowering, so wide inputs reshape
    to [w, .., L, G] blocks and scan the short leading axis (the same
    layout trick as curve/msm._window_sum), recursing on the G block
    totals."""
    n = v.shape[-1]
    w = 1024
    if n % w or n // w < 2:
        return jax.lax.associative_scan(F.mul, v, axis=v.ndim - 1,
                                        reverse=reverse)
    G = n // w
    b = jnp.moveaxis(v.reshape(v.shape[:-1] + (G, w)), -1, 0)
    intra = jax.lax.associative_scan(F.mul, b, axis=0, reverse=reverse)
    tot = intra[0] if reverse else intra[-1]           # [.., L, G]
    totp = _scan_prod(F, tot, reverse)
    one = jnp.broadcast_to(F.one(()), tot.shape[:-1] + (1,))
    if reverse:
        excl = jnp.concatenate([totp[..., 1:], one], axis=-1)
    else:
        excl = jnp.concatenate([one, totp[..., :-1]], axis=-1)
    out = F.mul(intra, excl)
    return jnp.moveaxis(out, 0, -1).reshape(v.shape)


def to_affine_batch(C: CurveOps, p: Point) -> Point:
    """Normalize a point batch to z in {0, 1}: (x/z, y/z, 1), identity
    kept as (0, 1, 0). ONE field inversion for the whole batch via the
    Montgomery product-tree trick (prefix*suffix products of z), so the
    cost is ~5 batched muls + a single Fermat inversion — libff keeps
    MSM bases affine for the same reason (`multi_exp_with_mixed_
    addition`); normalized bases feed `msm(points_affine=True)`."""
    F = C.F
    is_id = F.is_zero(p.z)
    shape = F.batch_shape(p.z)
    one = F.bcast(F.one(()), shape)
    zsafe = F.select(is_id, one, p.z)
    pref = _scan_prod(F, zsafe, reverse=False)
    suf = _scan_prod(F, zsafe, reverse=True)
    tinv = F.inv(pref[..., -1:])
    pref_m1 = jnp.concatenate([one[..., :1], pref[..., :-1]], axis=-1)
    suf_p1 = jnp.concatenate([suf[..., 1:], one[..., :1]], axis=-1)
    zinv = F.mul(tinv, F.mul(pref_m1, suf_p1))
    x = F.mul(p.x, zinv)
    y = F.mul(p.y, zinv)
    zero = F.bcast(F.zero(()), shape)
    return Point(F.select(is_id, zero, x),
                 F.select(is_id, one, y),
                 F.select(is_id, zero, one))


# ---------------------------------------------------------------------------
# Concrete curves
# ---------------------------------------------------------------------------

_fq = FqOps(bn254.FQ)
_fq2 = Fq2Ops(_fq)

G1 = CurveOps(_fq, _fq.const(bn254.B_G1),
              _fq.const(3 * bn254.B_G1 % bn254.Q),
              b3_int=3 * bn254.B_G1 % bn254.Q)
_b3_g2 = ((3 * bn254.B_G2[0]) % bn254.Q, (3 * bn254.B_G2[1]) % bn254.Q)
G2 = CurveOps(_fq2, _fq2.const(bn254.B_G2), _fq2.const(_b3_g2))

FQ_OPS = _fq
FQ2_OPS = _fq2
FR_OPS = FqOps(bn254.FR)


def g1_generator(shape=()) -> Point:
    x = _fq.bcast(_fq.const(bn254.G1_GEN[0]), shape)
    y = _fq.bcast(_fq.const(bn254.G1_GEN[1]), shape)
    return G1.from_affine(x, y)


def g2_generator(shape=()) -> Point:
    x = _fq2.bcast(_fq2.const(bn254.G2_GEN_X), shape)
    y = _fq2.bcast(_fq2.const(bn254.G2_GEN_Y), shape)
    return G2.from_affine(x, y)


@jax.jit
def _g1_affine(p: Point):
    return G1.to_affine(p)


@jax.jit
def _g2_affine(p: Point):
    return G2.to_affine(p)


def g1_to_oracle(p: Point):
    """Single G1 point [L, 1] -> python int affine pair or None."""
    x, y, is_id = _g1_affine(p)
    if bool(np.asarray(is_id).reshape(-1)[0]):
        return None
    return (_fq.to_int(x), _fq.to_int(y))


def g1_to_oracle_batch(p: Point):
    """Batched [L, n] G1 points -> list of int pairs / None. One jitted
    affine conversion for the whole batch (eager per-point conversion is
    pathologically slow on the limb engine)."""
    x, y, is_id = _g1_affine(p)
    x, y, is_id = np.asarray(x), np.asarray(y), np.asarray(is_id)
    out = []
    for i in range(x.shape[-1]):
        if is_id[..., i]:
            out.append(None)
        else:
            out.append((_fq.spec.from_mont_limbs(x[..., :, i]),
                        _fq.spec.from_mont_limbs(y[..., :, i])))
    return out


def g2_to_oracle(p: Point):
    x, y, is_id = _g2_affine(p)
    if bool(np.asarray(is_id).reshape(-1)[0]):
        return None
    return (_fq2.to_ints(x), _fq2.to_ints(y))


def g2_to_oracle_batch(p: Point):
    x, y, is_id = _g2_affine(p)
    x, y, is_id = np.asarray(x), np.asarray(y), np.asarray(is_id)
    out = []
    for i in range(x.shape[-1]):
        if is_id[..., i]:
            out.append(None)
        else:
            out.append((
                (_fq.spec.from_mont_limbs(x[0, :, i]),
                 _fq.spec.from_mont_limbs(x[1, :, i])),
                (_fq.spec.from_mont_limbs(y[0, :, i]),
                 _fq.spec.from_mont_limbs(y[1, :, i])),
            ))
    return out


def g1_from_oracle(pts) -> Point:
    """List of (x, y) int pairs / None -> batched Point [L, n]."""
    xs, ys, zs = [], [], []
    for p in pts:
        if p is None:
            xs.append(0); ys.append(1); zs.append(0)
        else:
            xs.append(p[0]); ys.append(p[1]); zs.append(1)
    return Point(_fq.from_ints(xs), _fq.from_ints(ys), _fq.from_ints(zs))


def g2_from_oracle(pts) -> Point:
    xs, ys, zs = [], [], []
    for p in pts:
        if p is None:
            xs.append((0, 0)); ys.append((1, 0)); zs.append((0, 0))
        else:
            xs.append(p[0]); ys.append(p[1]); zs.append((1, 0))
    return Point(_fq2.from_int_pairs(xs), _fq2.from_int_pairs(ys),
                 _fq2.from_int_pairs(zs))
