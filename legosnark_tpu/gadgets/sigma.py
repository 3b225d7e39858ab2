"""Sigma-protocol NIZKs over Pedersen commitments.

TPU-native, *sound* re-design of `ZKEqProof`/`ZKPrdProof`
(`/root/reference/src/gadgets/sigma.{h,cc}`). The reference versions
are benchmarking artifacts: the prover samples its own challenge
(`sigma.cc:14`, no Fiat-Shamir) and `ZKPrdProof` never assigns its
first-move elements (`sigma.h:29` — alpha/beta/delta stay
default-initialized, verification passes only because every base is
the identity-exponent generator). Here both protocols are the real
Chaum-Pedersen / CP93-product arguments; challenges are injectable
(honest-verifier mode, mirroring the reference's cost profile) and a
Fiat-Shamir transcript hash can supply them instead (utils.transcript).

Commitments are scalar Pedersen: C = v*G + r*H over G1.
"""
from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, FR_OPS

FR = bn254.FR


def _smul(p: Point, k_mont) -> Point:
    """k*P with the point broadcast across the scalar batch: p [.., L, 1]
    against k [L, m] yields [.., L, m]."""
    k = fl.from_mont(FR, k_mont)
    if p.x.shape[-1] == 1 and k.shape[-1] != 1:
        p = Point(*(jnp.broadcast_to(c, c.shape[:-1] + k.shape[-1:])
                    for c in p))
    return G1.scalar_mul(p, k)


def pedersen(g: Point, h: Point, v_mont, r_mont) -> Point:
    """C = v*G + r*H."""
    return G1.add(_smul(g, v_mont), _smul(h, r_mont))


class ZKEqProof(NamedTuple):
    """Proves Com(v; r0) and Com(v; r1) hide the same value: a Schnorr
    proof of opening of c0 - c1 = (r0-r1)*H to zero (`sigma.cc:3-24`)."""

    a: Point  # first move k*H
    z: Any    # response k + e*(r0 - r1), Montgomery Fr


def zkeq_prove(g: Point, h: Point, r0, r1, k, e) -> ZKEqProof:
    """k: prover nonce; e: challenge (both Montgomery Fr [L, 1] — or
    [L, d] to produce d independent proofs in one vectorized call)."""
    a = _smul(h, k)
    z = FR_OPS.add(k, FR_OPS.mul(e, FR_OPS.sub(r0, r1)))
    return ZKEqProof(a, z)


def zkeq_verify(h: Point, c0: Point, c1: Point, pf: ZKEqProof, e):
    """z*H == a + e*(c0 - c1)."""
    lhs = _smul(h, pf.z)
    rhs = G1.add(pf.a, _smul(G1.add(c0, G1.neg(c1)), e))
    return G1.eq(lhs, rhs)


class ZKPrdProof(NamedTuple):
    """CP93 product argument: cz hides x*y given cx, cy
    (sound version of `sigma.cc:27-69`)."""

    alpha: Point
    beta: Point
    delta: Point
    z1: Any
    z2: Any
    z3: Any
    z4: Any
    z5: Any


def zkprd_prove(g: Point, h: Point, x, rx, y, ry, rz, bs, e) -> ZKPrdProof:
    """bs: [L, 5] prover nonces; e: challenge [L, 1]. cx=Com(x;rx),
    cy=Com(y;ry), cz=Com(x*y; rz)."""
    F = FR_OPS
    b1, b2, b3, b4, b5 = (bs[..., i : i + 1] for i in range(5))
    cy = pedersen(g, h, y, ry)
    alpha = pedersen(g, h, b1, b2)
    beta = pedersen(g, h, b3, b4)
    delta = G1.add(_smul(cy, b1), _smul(h, b5))
    z1 = F.add(b1, F.mul(e, x))
    z2 = F.add(b2, F.mul(e, rx))
    z3 = F.add(b3, F.mul(e, y))
    z4 = F.add(b4, F.mul(e, ry))
    z5 = F.add(b5, F.mul(e, F.sub(rz, F.mul(x, ry))))
    return ZKPrdProof(alpha, beta, delta, z1, z2, z3, z4, z5)


def zkprd_verify(g: Point, h: Point, cx: Point, cy: Point, cz: Point,
                 pf: ZKPrdProof, e):
    """Three group equations (`sigma.cc:57-69`, done right):
      z1*G + z2*H == alpha + e*cx
      z3*G + z4*H == beta  + e*cy
      z1*cy + z5*H == delta + e*cz
    """
    c1 = G1.eq(pedersen(g, h, pf.z1, pf.z2), G1.add(pf.alpha, _smul(cx, e)))
    c2 = G1.eq(pedersen(g, h, pf.z3, pf.z4), G1.add(pf.beta, _smul(cy, e)))
    c3 = G1.eq(G1.add(_smul(cy, pf.z1), _smul(h, pf.z5)),
               G1.add(pf.delta, _smul(cz, e)))
    return jnp.logical_and(c1, jnp.logical_and(c2, c3))
