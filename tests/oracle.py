"""Pure-Python (bigint) BN254 oracle used to validate the TPU kernels.

Plays the role libff's own test suite plays for the reference (the
reference vendors libff under `depends/` and trusts it; see SURVEY §2.2).
Everything here is slow, obvious, int-based math — the point is
trustworthiness, not speed. The Fq12 tower uses the SAME construction as
`legosnark_tpu.curve` (Fq2=Fq[u]/(u^2+1), Fq6=Fq2[v]/(v^3-xi),
Fq12=Fq6[w]/(w^2-v)) so values compare limb-for-limb.

Independently validated by test_oracle.py: group laws, orders, pairing
bilinearity + non-degeneracy.
"""
from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from legosnark_tpu.curve.bn254 import (  # noqa: E402
    Q, R, BN_X, XI, B_G1, B_G2, G1_GEN, G2_GEN_X, G2_GEN_Y,
)

# ---------------------------------------------------------------------------
# Fq2 (tuples (c0, c1), u^2 = -1)
# ---------------------------------------------------------------------------

F2_ZERO = (0, 0)
F2_ONE = (1, 0)


def f2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def f2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def f2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def f2_mul(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % Q,
        (a[0] * b[1] + a[1] * b[0]) % Q,
    )


def f2_muls(a, s):
    return ((a[0] * s) % Q, (a[1] * s) % Q)


def f2_sqr(a):
    return f2_mul(a, a)


def f2_inv(a):
    d = pow(a[0] * a[0] + a[1] * a[1], -1, Q)
    return ((a[0] * d) % Q, (-a[1] * d) % Q)


def f2_conj(a):
    return (a[0], (-a[1]) % Q)


def f2_pow(a, e):
    acc = F2_ONE
    while e:
        if e & 1:
            acc = f2_mul(acc, a)
        a = f2_sqr(a)
        e >>= 1
    return acc


# ---------------------------------------------------------------------------
# Fq6 (triples of Fq2, v^3 = XI) and Fq12 (pairs of Fq6, w^2 = v)
# ---------------------------------------------------------------------------

F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)


def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))


def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))


def f6_neg(a):
    return tuple(f2_neg(x) for x in a)


def f6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0, t1, t2 = f2_mul(a0, b0), f2_mul(a1, b1), f2_mul(a2, b2)
    c0 = f2_add(t0, f2_mul(XI, f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)),
                                      f2_add(t1, t2))))
    c1 = f2_add(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)),
                       f2_add(t0, t1)), f2_mul(XI, t2))
    c2 = f2_add(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)),
                       f2_add(t0, t2)), t1)
    return (c0, c1, c2)


def f6_mul_by_v(a):
    # v * (a0 + a1 v + a2 v^2) = XI*a2 + a0 v + a1 v^2
    return (f2_mul(XI, a[2]), a[0], a[1])


def f6_inv(a):
    a0, a1, a2 = a
    c0 = f2_sub(f2_sqr(a0), f2_mul(XI, f2_mul(a1, a2)))
    c1 = f2_sub(f2_mul(XI, f2_sqr(a2)), f2_mul(a0, a1))
    c2 = f2_sub(f2_sqr(a1), f2_mul(a0, a2))
    t = f2_inv(f2_add(f2_mul(a0, c0),
                      f2_mul(XI, f2_add(f2_mul(a2, c1), f2_mul(a1, c2)))))
    return (f2_mul(c0, t), f2_mul(c1, t), f2_mul(c2, t))


F12_ZERO = (F6_ZERO, F6_ZERO)
F12_ONE = (F6_ONE, F6_ZERO)


def f12_add(a, b):
    return (f6_add(a[0], b[0]), f6_add(a[1], b[1]))


def f12_sub(a, b):
    return (f6_sub(a[0], b[0]), f6_sub(a[1], b[1]))


def f12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = f6_mul(a0, b0)
    t1 = f6_mul(a1, b1)
    c0 = f6_add(t0, f6_mul_by_v(t1))
    c1 = f6_sub(f6_mul(f6_add(a0, a1), f6_add(b0, b1)), f6_add(t0, t1))
    return (c0, c1)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_inv(a):
    a0, a1 = a
    t = f6_inv(f6_sub(f6_mul(a0, a0), f6_mul_by_v(f6_mul(a1, a1))))
    return (f6_mul(a0, t), f6_neg(f6_mul(a1, t)))


def f12_conj(a):
    return (a[0], f6_neg(a[1]))


def f12_pow(a, e):
    if e < 0:
        return f12_pow(f12_inv(a), -e)
    acc = F12_ONE
    while e:
        if e & 1:
            acc = f12_mul(acc, a)
        a = f12_sqr(a)
        e >>= 1
    return acc


def f12_from_fq(x):
    return (((x % Q, 0), F2_ZERO, F2_ZERO), F6_ZERO)


def f12_from_fq2(x):
    return ((x, F2_ZERO, F2_ZERO), F6_ZERO)


# w = (0, 1): w^2 = v
F12_W = (F6_ZERO, F6_ONE)
F12_W2 = f12_mul(F12_W, F12_W)
F12_W3 = f12_mul(F12_W2, F12_W)


# ---------------------------------------------------------------------------
# G1 over Fq, G2 over Fq2 — affine int arithmetic; None = infinity
# ---------------------------------------------------------------------------


def g1_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    (x1, y1), (x2, y2) = p, q
    if x1 == x2 and (y1 + y2) % Q == 0:
        return None
    if p == q:
        lam = 3 * x1 * x1 * pow(2 * y1, -1, Q) % Q
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    return (x3, (lam * (x1 - x3) - y1) % Q)


def g1_neg(p):
    return None if p is None else (p[0], (-p[1]) % Q)


def g1_mul(p, k):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = g1_add(acc, p)
        p = g1_add(p, p)
        k >>= 1
    return acc


def g1_on_curve(p):
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - B_G1) % Q == 0


def g2_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    (x1, y1), (x2, y2) = p, q
    if x1 == x2 and f2_add(y1, y2) == F2_ZERO:
        return None
    if p == q:
        lam = f2_mul(f2_muls(f2_sqr(x1), 3), f2_inv(f2_muls(y1, 2)))
    else:
        lam = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    return (x3, f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1))


def g2_neg(p):
    return None if p is None else (p[0], f2_neg(p[1]))


def g2_mul(p, k):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = g2_add(acc, p)
        p = g2_add(p, p)
        k >>= 1
    return acc


def g2_on_curve(p):
    if p is None:
        return True
    x, y = p
    return f2_sub(f2_sub(f2_sqr(y), f2_mul(x, f2_sqr(x))), B_G2) == F2_ZERO


G1 = G1_GEN
G2 = (G2_GEN_X, G2_GEN_Y)


# ---------------------------------------------------------------------------
# Pairing: untwist to E(Fq12), generic Miller loop, naive final exp
# ---------------------------------------------------------------------------


def untwist(p):
    """E'(Fq2) -> E(Fq12): (x, y) -> (x*w^2, y*w^3)  (w^6 = xi, D-twist)."""
    if p is None:
        return None
    x, y = p
    return (f12_mul(f12_from_fq2(x), F12_W2), f12_mul(f12_from_fq2(y), F12_W3))


def e12_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    (x1, y1), (x2, y2) = p, q
    if x1 == x2 and f12_add(y1, y2) == F12_ZERO:
        return None
    if p == q:
        num = f12_mul(f12_from_fq(3), f12_mul(x1, x1))
        lam = f12_mul(num, f12_inv(f12_add(y1, y1)))
    else:
        lam = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
    x3 = f12_sub(f12_sub(f12_mul(lam, lam), x1), x2)
    return (x3, f12_sub(f12_mul(lam, f12_sub(x1, x3)), y1))


def _linefunc(t, q, p):
    """Value of the line through t,q (or tangent at t if t==q) at p."""
    (x1, y1) = t
    (x2, y2) = q
    (xp, yp) = p
    if x1 != x2:
        lam = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
    elif y1 == y2:
        num = f12_mul(f12_from_fq(3), f12_mul(x1, x1))
        lam = f12_mul(num, f12_inv(f12_add(y1, y1)))
    else:
        return f12_sub(xp, x1)
    return f12_sub(f12_sub(yp, y1), f12_mul(lam, f12_sub(xp, x1)))


ATE_LOOP = 6 * BN_X + 2


def frob_e12(p, n=1):
    """q^n-power Frobenius on an E(Fq12) point (coefficient-wise x -> x^(q^n))."""
    if p is None:
        return None

    def f12_frob(a):
        # brute force: coefficientwise pow is wrong; use full exponentiation
        return f12_pow(a, Q**n)

    return (f12_frob(p[0]), f12_frob(p[1]))


def miller_loop(q_e12, p_e12):
    if q_e12 is None or p_e12 is None:
        return F12_ONE
    f = F12_ONE
    t = q_e12
    for bit in bin(ATE_LOOP)[3:]:
        f = f12_mul(f12_sqr(f), _linefunc(t, t, p_e12))
        t = e12_add(t, t)
        if bit == "1":
            f = f12_mul(f, _linefunc(t, q_e12, p_e12))
            t = e12_add(t, q_e12)
    q1 = frob_e12(q_e12, 1)
    q2 = frob_e12(q_e12, 2)
    nq2 = (q2[0], f12_sub(F12_ZERO, q2[1]))
    f = f12_mul(f, _linefunc(t, q1, p_e12))
    t = e12_add(t, q1)
    f = f12_mul(f, _linefunc(t, nq2, p_e12))
    return f


def final_exp(f):
    return f12_pow(f, (Q**12 - 1) // R)


def pairing(p_g1, q_g2):
    """Optimal ate pairing e(P, Q) for P in G1, Q in G2."""
    if p_g1 is None or q_g2 is None:
        return F12_ONE
    p12 = (f12_from_fq(p_g1[0]), f12_from_fq(p_g1[1]))
    return final_exp(miller_loop(untwist(q_g2), p12))
