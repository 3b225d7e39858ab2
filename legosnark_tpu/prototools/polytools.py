"""Univariate dense polynomials over Fr (`PolyT` parity).

TPU-native equivalent of `PolyT`
(`/root/reference/src/prototools/polytools.h:14-135`): dense
coefficient arrays [L, deg+1] in Montgomery form (coefficients on the
vector axis, ascending), batched ops, plus the homomorphic evaluation
over commitment points that the sumcheck verifier lives on
(`evalAsPolyOn`, `polytools.h:104-124`).

Degrees here are tiny (sumcheck round polys are degree <= 3), so
schoolbook products — exactly the reference's `mul` (`polytools.h:54-64`)
— are the right shape; large products go through prototools.ntt.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1

FR = bn254.FR


def zero(deg: int):
    return fl.zero(FR, (deg + 1,))


def one():
    return fl.one(FR)


def x():
    """The polynomial X (`polytools.h:39-44`)."""
    return jnp.concatenate([fl.zero(FR), fl.one(FR)], axis=-1)


def one_minus_x():
    """1 - X (`polytools.h:46-52`)."""
    return jnp.concatenate([fl.one(FR), fl.neg(FR, fl.one(FR))], axis=-1)


def add(a, b):
    """Coefficient add, ragged lengths allowed (`polytools.h:73-85`)."""
    la, lb = a.shape[-1], b.shape[-1]
    if la < lb:
        a = jnp.concatenate([a, fl.zero(FR, (lb - la,))], axis=-1)
    elif lb < la:
        b = jnp.concatenate([b, fl.zero(FR, (la - lb,))], axis=-1)
    return fl.add(FR, a, b)


def mul(a, b):
    """Schoolbook product (`polytools.h:54-64`) — static shapes, fine
    for the degree-<=3 sumcheck round polys."""
    la, lb = a.shape[-1], b.shape[-1]
    out = fl.zero(FR, (la + lb - 1,))
    for i in range(la):
        prod = fl.mont_mul(FR, a[..., i : i + 1], b)
        upd = fl.add(FR, out[..., i : i + lb], prod)
        out = jnp.concatenate(
            [out[..., :i], upd, out[..., i + lb :]], axis=-1)
    return out


def scalar_mul(a, s):
    """s * poly (`polytools.h:66-71`); s: [L, 1]."""
    return fl.mont_mul(FR, a, s)


def eval_at(a, t):
    """Horner evaluation (`polytools.h:92-101` uses powers; Horner is
    the same count of muls without materializing them). a: [L, m],
    t: [L, 1] -> [L, 1]."""
    m = a.shape[-1]
    acc = a[..., m - 1 : m]
    for i in range(m - 2, -1, -1):
        acc = fl.add(FR, fl.mont_mul(FR, acc, t), a[..., i : i + 1])
    return acc


def powers_of(t, m: int):
    """[1, t, t^2, ..., t^(m-1)] as [L, m]; t: [L, 1] Montgomery."""
    cols = [fl.one(FR)]
    for _ in range(m - 1):
        cols.append(fl.mont_mul(FR, cols[-1], t))
    return jnp.concatenate(cols, axis=-1)


def eval_as_poly_on(comms: Point, t_mont) -> Point:
    """Homomorphic evaluation sum_j t^j * C_j over a commitment batch
    [.., L, deg+1] (`polytools.h:104-124`).

    One BATCHED double-and-add over all deg+1 points at once (vector
    width deg+1) followed by a tree sum — ~2.5x fewer sequential group
    ops than the reference's per-coefficient Horner chain."""
    m = comms.x.shape[-1]
    pw = fl.from_mont(FR, powers_of(t_mont, m))   # canonical [L, m]
    scaled = G1.scalar_mul(comms, pw)
    return G1.sum_reduce(scaled)


def sum_over_all_bin_values(v_mont):
    """Brute-force sum of an MLE table over the Boolean cube
    (`polytools.h:241-261` — with the reference's out1 double-zero bug
    fixed: here it is simply the table sum)."""
    from . import mle
    return mle.field_sum(v_mont)
