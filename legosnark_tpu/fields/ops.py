"""Uniform op interfaces over Fq and the Fq2 extension.

The curve group law (`legosnark_tpu.curve.group`) is written once,
generically, against this interface — the same complete-addition code
serves G1 (over Fq) and G2 (over Fq2), mirroring how the reference gets
G2 "for free" from libff's templated curve code (SURVEY §2.2).

Element layout: Fq elements are uint32 arrays [..., L]; Fq2 elements are
[..., 2, L] (c0, c1 stacked), so every point is a plain pytree of
arrays — jit/vmap/shard_map friendly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import limb as fl
from .limb import FieldSpec


class FqOps:
    """Prime-field ops (Montgomery form)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.suffix = (spec.nlimbs,)

    def add(self, a, b):
        return fl.add(self.spec, a, b)

    def sub(self, a, b):
        return fl.sub(self.spec, a, b)

    def neg(self, a):
        return fl.neg(self.spec, a)

    def mul(self, a, b):
        return fl.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return fl.mont_sqr(self.spec, a)

    def inv(self, a):
        return fl.inv(self.spec, a)

    def zero(self, shape=()):
        return fl.zero(self.spec, shape)

    def one(self, shape=()):
        return fl.one(self.spec, shape)

    def is_zero(self, a):
        return fl.is_zero(self.spec, a)

    def eq(self, a, b):
        return fl.eq(self.spec, a, b)

    def select(self, c, a, b):
        return jnp.where(c[..., None], a, b)

    def const(self, x: int):
        """Montgomery-form constant from a Python int."""
        return jnp.asarray(self.spec.to_mont_int(x))

    def to_int(self, a) -> int:
        return self.spec.from_mont_limbs(np.asarray(a))

    def from_ints(self, xs):
        """Batch int -> Montgomery limbs; uses the native C++ codec
        (legosnark_tpu.native) when available."""
        try:
            from ..native import encode_ints
            return jnp.asarray(encode_ints(self.spec, [int(x) for x in xs]))
        except Exception:
            return jnp.asarray(
                np.stack([self.spec.to_mont_int(int(x)) for x in xs]))

    def batch_shape(self, a):
        return a.shape[:-1]


class Fq2Ops:
    """Quadratic extension Fq[u]/(u^2+1) over a base FqOps."""

    def __init__(self, base: FqOps):
        self.base = base
        self.spec = base.spec
        self.suffix = (2, base.spec.nlimbs)

    def c0(self, a):
        return a[..., 0, :]

    def c1(self, a):
        return a[..., 1, :]

    def pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def add(self, a, b):
        F = self.base
        return self.pack(F.add(self.c0(a), self.c0(b)),
                         F.add(self.c1(a), self.c1(b)))

    def sub(self, a, b):
        F = self.base
        return self.pack(F.sub(self.c0(a), self.c0(b)),
                         F.sub(self.c1(a), self.c1(b)))

    def neg(self, a):
        F = self.base
        return self.pack(F.neg(self.c0(a)), F.neg(self.c1(a)))

    def conj(self, a):
        F = self.base
        return self.pack(self.c0(a), F.neg(self.c1(a)))

    def mul(self, a, b):
        # Karatsuba: 3 base muls
        F = self.base
        a0, a1, b0, b1 = self.c0(a), self.c1(a), self.c0(b), self.c1(b)
        t0 = F.mul(a0, b0)
        t1 = F.mul(a1, b1)
        t2 = F.mul(F.add(a0, a1), F.add(b0, b1))
        return self.pack(F.sub(t0, t1), F.sub(t2, F.add(t0, t1)))

    def sqr(self, a):
        # (a0+a1)(a0-a1), 2 a0 a1
        F = self.base
        a0, a1 = self.c0(a), self.c1(a)
        c0 = F.mul(F.add(a0, a1), F.sub(a0, a1))
        t = F.mul(a0, a1)
        return self.pack(c0, F.add(t, t))

    def inv(self, a):
        F = self.base
        a0, a1 = self.c0(a), self.c1(a)
        norm = F.add(F.sqr(a0), F.sqr(a1))
        ninv = F.inv(norm)
        return self.pack(F.mul(a0, ninv), F.neg(F.mul(a1, ninv)))

    def mul_by_xi(self, a):
        """Multiply by xi = 9 + u (the Fq6 non-residue)."""
        F = self.base
        a0, a1 = self.c0(a), self.c1(a)
        # (9 a0 - a1) + (a0 + 9 a1) u ; 9x = 8x + x via three doublings
        def mul9(x):
            x2 = F.add(x, x)
            x4 = F.add(x2, x2)
            x8 = F.add(x4, x4)
            return F.add(x8, x)
        return self.pack(F.sub(mul9(a0), a1), F.add(a0, mul9(a1)))

    def mul_base(self, a, s):
        """Multiply by a base-field scalar s [..., L]."""
        F = self.base
        return self.pack(F.mul(self.c0(a), s), F.mul(self.c1(a), s))

    def zero(self, shape=()):
        return self.base.zero(tuple(shape) + (2,))

    def one(self, shape=()):
        F = self.base
        return self.pack(F.one(shape), F.zero(shape))

    def is_zero(self, a):
        # redundant domain: canonicalize each Fq coefficient first
        return jnp.all(fl.canon(self.spec, a) == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(fl.canon(self.spec, a) == fl.canon(self.spec, b),
                       axis=(-1, -2))

    def select(self, c, a, b):
        return jnp.where(c[..., None, None], a, b)

    def const(self, x):
        """Constant from an int pair (c0, c1)."""
        c0, c1 = x
        return jnp.stack([jnp.asarray(self.spec.to_mont_int(c0 % self.spec.p)),
                          jnp.asarray(self.spec.to_mont_int(c1 % self.spec.p))])

    def to_ints(self, a):
        return (self.base.to_int(self.c0(a)), self.base.to_int(self.c1(a)))

    def from_int_pairs(self, xs):
        """[(c0,c1), ...] -> [n, 2, L]."""
        return jnp.asarray(np.stack([
            np.stack([self.spec.to_mont_int(int(x0) % self.spec.p),
                      self.spec.to_mont_int(int(x1) % self.spec.p)])
            for (x0, x1) in xs]))

    def batch_shape(self, a):
        return a.shape[:-2]
