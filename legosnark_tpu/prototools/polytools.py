"""Univariate dense polynomials over Fr (`PolyT` parity).

TPU-native equivalent of `PolyT`
(`/root/reference/src/prototools/polytools.h:14-135`): dense
coefficient arrays [deg+1, L] in Montgomery form, batched ops, plus the
homomorphic evaluation over commitment points that the sumcheck
verifier lives on (`evalAsPolyOn`, `polytools.h:104-124`).

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
    return fl.one(FR)[None]


def x():
    """The polynomial X (`polytools.h:39-44`)."""
    return jnp.stack([fl.zero(FR), fl.one(FR)])


def one_minus_x():
    """1 - X (`polytools.h:46-52`)."""
    return jnp.stack([fl.one(FR), fl.neg(FR, fl.one(FR))])


def add(a, b):
    """Coefficient add, ragged lengths allowed (`polytools.h:73-85`)."""
    la, lb = a.shape[0], b.shape[0]
    if la < lb:
        a = jnp.concatenate([a, fl.zero(FR, (lb - la,))], axis=0)
    elif lb < la:
        b = jnp.concatenate([b, fl.zero(FR, (la - lb,))], axis=0)
    return fl.add(FR, a, b)


def mul(a, b):
    """Schoolbook product (`polytools.h:54-64`) — static shapes, fine
    for the degree-<=3 sumcheck round polys."""
    la, lb = a.shape[0], b.shape[0]
    out = fl.zero(FR, (la + lb - 1,))
    for i in range(la):
        prod = fl.mont_mul(FR, a[i][None], b)
        out = out.at[i : i + lb].set(fl.add(FR, out[i : i + lb], prod))
    return out


def scalar_mul(a, s):
    """s * poly (`polytools.h:66-71`)."""
    return fl.mont_mul(FR, a, s[None])


def eval_at(a, t):
    """Horner evaluation (`polytools.h:92-101` uses powers; Horner is
    the same count of muls without materializing them)."""
    acc = a[-1]
    for i in range(a.shape[0] - 2, -1, -1):
        acc = fl.add(FR, fl.mont_mul(FR, acc, t), a[i])
    return acc


def eval_as_poly_on(comms: Point, t_mont) -> Point:
    """Homomorphic evaluation sum_j t^j * C_j over stacked commitment
    points [deg+1] (`polytools.h:104-124`) — Horner over the group."""
    k1 = comms.x.shape[0]
    acc = Point(comms.x[k1 - 1], comms.y[k1 - 1], comms.z[k1 - 1])
    t_can = fl.from_mont(FR, t_mont)
    for j in range(k1 - 2, -1, -1):
        acc = G1.scalar_mul(acc, t_can)
        acc = G1.add(acc, Point(comms.x[j], comms.y[j], comms.z[j]))
    return acc


def sum_over_all_bin_values(v_mont):
    """Brute-force sum of an MLE table over the Boolean cube
    (`polytools.h:241-261` — with the reference's out1 double-zero bug
    fixed: here it is simply the table sum)."""
    from . import mle
    return mle.field_sum(v_mont)
