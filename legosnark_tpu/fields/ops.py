"""Uniform op interfaces over Fq and the Fq2 extension.

The curve group law (`legosnark_tpu.curve.group`) is written once,
generically, against this interface — the same complete-addition code
serves G1 (over Fq) and G2 (over Fq2), mirroring how the reference gets
G2 "for free" from libff's templated curve code (SURVEY §2.2).

Element layout (TPU-first, see fields/limb.py): Fq elements are uint32
arrays ``[..., L, V]`` — limb axis on the sublane dimension, batch
vector axis on the lane dimension. Fq2 elements are ``[..., 2, L, V]``
(c0, c1 stacked ahead of the limbs). Every point is a plain pytree of
arrays — jit/vmap/shard_map friendly.

Batch shapes are tuples whose LAST entry is the vector axis:
``batch_shape([..., L, V]) == (..., V)``; a "single" element is the
V=1 batch ``[L, 1]`` with batch shape ``(1,)``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import limb as fl
from .limb import FieldSpec


def ext_shape(shape, k: int):
    """Insert a tower/limb axis of size k ahead of the vector axis."""
    shape = tuple(shape)
    if not shape:
        return (k, 1)
    return shape[:-1] + (k, shape[-1])


class FqOps:
    """Prime-field ops (Montgomery form)."""

    #: number of element axes after the batch dims (limb + vector)
    ndim = 2

    def __init__(self, spec: FieldSpec):
        self.spec = spec

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
        return jnp.where(c[..., None, :], a, b)

    def const(self, x: int):
        """Montgomery-form constant [L, 1] from a Python int."""
        return fl.const_mont(self.spec, x)

    def bcast(self, c, batch_shape):
        """Broadcast a [L, 1] constant to a batch shape."""
        return jnp.broadcast_to(c, ext_shape(batch_shape, self.spec.nlimbs))

    def to_int(self, a) -> int:
        return self.spec.from_mont_limbs(np.asarray(a))

    def to_ints_batch(self, a):
        """[..., L, V] Montgomery -> int object array [..., V]."""
        can = np.asarray(fl.from_mont(self.spec, a))
        vals = fl.limbs_to_ints(can)
        return vals

    def from_ints(self, xs):
        """Batch int -> Montgomery limbs [L, n]; uses the native C++
        codec (legosnark_tpu.native) when available."""
        try:
            from ..native import encode_ints
            return jnp.asarray(
                encode_ints(self.spec, [int(x) for x in xs]).T)
        except Exception:
            return jnp.asarray(self.spec.to_mont_ints(xs))

    def batch_shape(self, a):
        return a.shape[:-2] + a.shape[-1:]


class Fq2Ops:
    """Quadratic extension Fq[u]/(u^2+1) over a base FqOps."""

    ndim = 3

    def __init__(self, base: FqOps):
        self.base = base
        self.spec = base.spec

    def c0(self, a):
        return a[..., 0, :, :]

    def c1(self, a):
        return a[..., 1, :, :]

    def pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-3)

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
        """Multiply by a base-field scalar s [..., L, V]."""
        F = self.base
        return self.pack(F.mul(self.c0(a), s), F.mul(self.c1(a), s))

    def zero(self, shape=()):
        return self.base.zero(ext_shape(shape, 2))

    def one(self, shape=()):
        F = self.base
        return self.pack(F.one(shape), F.zero(shape))

    def is_zero(self, a):
        # redundant domain: canonicalize each Fq coefficient first
        return jnp.all(fl.canon(self.spec, a) == 0, axis=(-2, -3))

    def eq(self, a, b):
        return jnp.all(fl.canon(self.spec, a) == fl.canon(self.spec, b),
                       axis=(-2, -3))

    def select(self, c, a, b):
        return jnp.where(c[..., None, None, :], a, b)

    def const(self, x):
        """Constant [2, L, 1] from an int pair (c0, c1), HOST-backed
        and value-cached — safe to call (and lru-cache) from inside
        scans; embedded without device round-trips at lowering."""
        c0, c1 = x
        key = ("f2c", self.spec.p, int(c0), int(c1))
        hit = fl._CONST_CACHE.get(key)
        if hit is None:
            hit = np.stack([self.spec.to_mont_int(c0 % self.spec.p),
                            self.spec.to_mont_int(c1 % self.spec.p)])
            fl._CONST_CACHE[key] = hit
        return hit

    def bcast(self, c, batch_shape):
        # tower axis sits AHEAD of the limb axis: [.., 2, L, V]
        shape = tuple(batch_shape) or (1,)
        return jnp.broadcast_to(
            c, shape[:-1] + (2, self.spec.nlimbs, shape[-1]))

    def to_ints(self, a):
        return (self.base.to_int(self.c0(a)), self.base.to_int(self.c1(a)))

    def from_int_pairs(self, xs):
        """[(c0,c1), ...] -> [2, L, n]."""
        p = self.spec.p
        c0 = self.spec.to_mont_ints([x0 % p for (x0, _) in xs])
        c1 = self.spec.to_mont_ints([x1 % p for (_, x1) in xs])
        return jnp.asarray(np.stack([c0, c1], axis=0))

    def batch_shape(self, a):
        return a.shape[:-3] + a.shape[-1:]
