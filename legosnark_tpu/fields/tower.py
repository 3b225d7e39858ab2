"""Fq6 / Fq12 tower-field ops for the BN254 pairing.

TPU-native equivalent of libff's `Fqe/Fqk` tower used by every pairing
call site in the reference (`/root/reference/src/utils/globl.h:94-105`,
`/root/reference/src/gadgets/subspace.cc:88-171`,
`/root/reference/src/gadgets/poly.h:93-126`,
`/root/reference/src/gadgets/lipmaa.cc:187-207`).

Tower (same construction as the test oracle so values compare exactly):
  Fq2  = Fq [u] / (u^2 + 1)
  Fq6  = Fq2[v] / (v^3 - xi),  xi = 9 + u
  Fq12 = Fq6[w] / (w^2 - v)

Layouts (limb axis at -2, vector axis at -1, see fields/limb.py):
Fq6 = [..., 3, 2, L, V] (c0,c1,c2 Fq2 coords), Fq12 = [..., 2, 3, 2, L, V].
All ops batched, branchless, jit/vmap-safe.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import limb as fl
from .ops import FqOps, Fq2Ops, ext_shape


class Fq6Ops:
    """Cubic extension Fq2[v]/(v^3 - xi)."""

    ndim = 4

    def __init__(self, f2: Fq2Ops):
        self.f2 = f2

    def c(self, a, i):
        return a[..., i, :, :, :]

    def pack(self, c0, c1, c2):
        return jnp.stack([c0, c1, c2], axis=-4)

    def add(self, a, b):
        F = self.f2
        return self.pack(*(F.add(self.c(a, i), self.c(b, i)) for i in range(3)))

    def sub(self, a, b):
        F = self.f2
        return self.pack(*(F.sub(self.c(a, i), self.c(b, i)) for i in range(3)))

    def neg(self, a):
        F = self.f2
        return self.pack(*(F.neg(self.c(a, i)) for i in range(3)))

    def mul(self, a, b):
        # Toom/Karatsuba-style: 6 Fq2 muls (CH-SQR3 layout)
        F = self.f2
        a0, a1, a2 = (self.c(a, i) for i in range(3))
        b0, b1, b2 = (self.c(b, i) for i in range(3))
        t0 = F.mul(a0, b0)
        t1 = F.mul(a1, b1)
        t2 = F.mul(a2, b2)
        s1 = F.sub(F.mul(F.add(a1, a2), F.add(b1, b2)), F.add(t1, t2))
        s2 = F.sub(F.mul(F.add(a0, a1), F.add(b0, b1)), F.add(t0, t1))
        s3 = F.sub(F.mul(F.add(a0, a2), F.add(b0, b2)), F.add(t0, t2))
        c0 = F.add(t0, F.mul_by_xi(s1))
        c1 = F.add(s2, F.mul_by_xi(t2))
        c2 = F.add(s3, t1)
        return self.pack(c0, c1, c2)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_by_v(self, a):
        """v * (a0 + a1 v + a2 v^2) = xi*a2 + a0 v + a1 v^2."""
        F = self.f2
        return self.pack(F.mul_by_xi(self.c(a, 2)), self.c(a, 0), self.c(a, 1))

    def mul_f2(self, a, s):
        """Multiply by an Fq2 scalar."""
        F = self.f2
        return self.pack(*(F.mul(self.c(a, i), s) for i in range(3)))

    def inv(self, a):
        F = self.f2
        a0, a1, a2 = (self.c(a, i) for i in range(3))
        c0 = F.sub(F.sqr(a0), F.mul_by_xi(F.mul(a1, a2)))
        c1 = F.sub(F.mul_by_xi(F.sqr(a2)), F.mul(a0, a1))
        c2 = F.sub(F.sqr(a1), F.mul(a0, a2))
        t = F.inv(F.add(F.mul(a0, c0),
                        F.mul_by_xi(F.add(F.mul(a2, c1), F.mul(a1, c2)))))
        return self.pack(F.mul(c0, t), F.mul(c1, t), F.mul(c2, t))

    def zero(self, shape=()):
        return self.f2.zero(ext_shape(shape, 3))

    def one(self, shape=()):
        F = self.f2
        return self.pack(F.one(shape), F.zero(shape), F.zero(shape))

    def eq(self, a, b):
        spec = self.f2.spec
        return jnp.all(fl.canon(spec, a) == fl.canon(spec, b),
                       axis=(-2, -3, -4))

    def select(self, c, a, b):
        return jnp.where(c[..., None, None, None, :], a, b)


class Fq12Ops:
    """Quadratic extension Fq6[w]/(w^2 - v)."""

    ndim = 5

    def __init__(self, f6: Fq6Ops):
        self.f6 = f6
        self.f2 = f6.f2

    def c(self, a, i):
        return a[..., i, :, :, :, :]

    def pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-5)

    def add(self, a, b):
        F = self.f6
        return self.pack(F.add(self.c(a, 0), self.c(b, 0)),
                         F.add(self.c(a, 1), self.c(b, 1)))

    def sub(self, a, b):
        F = self.f6
        return self.pack(F.sub(self.c(a, 0), self.c(b, 0)),
                         F.sub(self.c(a, 1), self.c(b, 1)))

    def mul(self, a, b):
        F = self.f6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        b0, b1 = self.c(b, 0), self.c(b, 1)
        t0 = F.mul(a0, b0)
        t1 = F.mul(a1, b1)
        c0 = F.add(t0, F.mul_by_v(t1))
        c1 = F.sub(F.mul(F.add(a0, a1), F.add(b0, b1)), F.add(t0, t1))
        return self.pack(c0, c1)

    def sqr(self, a):
        # complex squaring: c1 = 2 a0 a1; c0 = (a0+a1)(a0+v a1) - a0a1 - v a0a1
        F = self.f6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        t = F.mul(a0, a1)
        c0 = F.sub(F.mul(F.add(a0, a1), F.add(a0, F.mul_by_v(a1))),
                   F.add(t, F.mul_by_v(t)))
        return self.pack(c0, F.add(t, t))

    def inv(self, a):
        F = self.f6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        t = F.inv(F.sub(F.sqr(a0), F.mul_by_v(F.sqr(a1))))
        return self.pack(F.mul(a0, t), F.neg(F.mul(a1, t)))

    def conj(self, a):
        """Conjugation a0 - a1 w == Frobenius^6 == unitary inverse."""
        F = self.f6
        return self.pack(self.c(a, 0), F.neg(self.c(a, 1)))

    def one(self, shape=()):
        F = self.f6
        return self.pack(F.one(shape), F.zero(shape))

    def batch_shape(self, a):
        return a.shape[:-5] + a.shape[-1:]

    def eq(self, a, b):
        spec = self.f6.f2.spec
        return jnp.all(fl.canon(spec, a) == fl.canon(spec, b),
                       axis=(-2, -3, -4, -5))

    def is_one(self, a):
        return self.eq(a, self.one(self.batch_shape(a)))

    def select(self, c, a, b):
        return jnp.where(c[..., None, None, None, None, :], a, b)

    # -- sparse multiplications used by the Miller loop ---------------------
    def mul_by_034(self, a, e0, e3, e4):
        """Multiply by the sparse element e0 + (e3 + e4 v) w (Fq2 coeffs
        c0, c3, c4 of the w-basis) — the D-twist line shape."""
        F6, F2 = self.f6, self.f2
        a0, a1 = self.c(a, 0), self.c(a, 1)
        # a0 * e0 (Fq2 scalar times Fq6)
        t0 = F6.mul_f2(a0, e0)
        # a1 * (e3 + e4 v): sparse Fq6 mul with c2 = 0
        b0, b1, b2 = (F6.c(a1, i) for i in range(3))
        t1 = F6.pack(
            F2.add(F2.mul(b0, e3), F2.mul_by_xi(F2.mul(b2, e4))),
            F2.add(F2.mul(b1, e3), F2.mul(b0, e4)),
            F2.add(F2.mul(b2, e3), F2.mul(b1, e4)),
        )
        # (a0 + a1) * (e0 + e3 + e4 v)
        s = F6.add(a0, a1)
        e03 = F2.add(e0, e3)
        s0, s1, s2 = (F6.c(s, i) for i in range(3))
        t2 = F6.pack(
            F2.add(F2.mul(s0, e03), F2.mul_by_xi(F2.mul(s2, e4))),
            F2.add(F2.mul(s1, e03), F2.mul(s0, e4)),
            F2.add(F2.mul(s2, e03), F2.mul(s1, e4)),
        )
        c0 = F6.add(t0, F6.mul_by_v(t1))
        c1 = F6.sub(t2, F6.add(t0, t1))
        return self.pack(c0, c1)
