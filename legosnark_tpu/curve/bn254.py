"""BN254 (alt_bn128) curve constants.

The reference selects this curve via `CURVE=BN128` in
`/root/reference/CMakeLists.txt:11-17` and aliases its types in
`/root/reference/src/utils/globl.h:25-31`. All parameters below are the
public alt_bn128 parameters (same curve family libff implements); they
are written as Python integers and every derived constant (Frobenius
coefficients, roots of unity, ...) is computed from them at import time
rather than hard-coded.
"""
from __future__ import annotations

import functools

from ..fields.limb import FieldSpec

# Base field and scalar field moduli.
Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# BN parameter x: q = 36x^4 + 36x^3 + 24x^2 + 6x + 1, r = 36x^4+36x^3+18x^2+6x+1
BN_X = 4965661367192848881
assert 36 * BN_X**4 + 36 * BN_X**3 + 24 * BN_X**2 + 6 * BN_X + 1 == Q
assert 36 * BN_X**4 + 36 * BN_X**3 + 18 * BN_X**2 + 6 * BN_X + 1 == R

# y^2 = x^3 + 3 over Fq; G1 generator
B_G1 = 3
G1_GEN = (1, 2)

# Fq2 = Fq[u]/(u^2 + 1); twist y^2 = x^3 + b/xi with xi = 9 + u  (D-twist)
XI = (9, 1)

# G2 generator (affine, Fq2 coords as (c0, c1))
G2_GEN_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GEN_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# Field specs: 20 limbs x 13 bits = 260 bits >= 254
NLIMBS = 20
FQ = FieldSpec(p=Q, nlimbs=NLIMBS, name="Fq")
FR = FieldSpec(p=R, nlimbs=NLIMBS, name="Fr")


def _fq2_mul(a, b):
    # host-side Fq2 helper over int pairs, u^2 = -1
    return (
        (a[0] * b[0] - a[1] * b[1]) % Q,
        (a[0] * b[1] + a[1] * b[0]) % Q,
    )


def _fq2_inv(a):
    d = pow(a[0] * a[0] + a[1] * a[1], -1, Q)
    return ((a[0] * d) % Q, (-a[1] * d) % Q)


def _fq2_pow(a, e):
    acc = (1, 0)
    base = a
    while e:
        if e & 1:
            acc = _fq2_mul(acc, base)
        base = _fq2_mul(base, base)
        e >>= 1
    return acc


# Twist curve coefficient b2 = 3 / xi  (alt_bn128 is a D-type twist)
B_G2 = _fq2_mul((B_G1, 0), _fq2_inv(XI))


@functools.lru_cache(None)
def fr_two_adic_root(log_n: int):
    """A primitive 2^log_n-th root of unity in Fr (max 2-adicity 28)."""
    two_adicity = 0
    t = R - 1
    while t % 2 == 0:
        t //= 2
        two_adicity += 1
    if log_n > two_adicity:
        raise ValueError(f"domain 2^{log_n} exceeds 2-adicity {two_adicity}")
    # find element of exact order 2^two_adicity
    g = 2
    while True:
        cand = pow(g, (R - 1) >> two_adicity, R)
        if pow(cand, 1 << (two_adicity - 1), R) != 1:
            break
        g += 1
    root = cand
    for _ in range(two_adicity - log_n):
        root = root * root % R
    return root


@functools.lru_cache(None)
def fr_multiplicative_generator():
    """Smallest multiplicative generator of Fr* (used as the coset shift,
    mirroring libfqfft's `FieldT::multiplicative_generator` used at
    `/root/reference/src/gadgets/lipmaa.cc:136-176`). Full factorization
    of r-1 is known for alt_bn128; we verify generator-ness against it."""
    factors = [2, 3, 13, 29, 983, 11003, 237073, 405928799, 1670836401704629,
               13818364434197438864469338081]
    acc = 1
    for f in set(factors):
        e = 0
        t = R - 1
        while t % f == 0:
            t //= f
            e += 1
        acc *= f**e
    assert acc == R - 1, "factorization of r-1 incomplete"
    g = 2
    while True:
        if all(pow(g, (R - 1) // f, R) != 1 for f in set(factors)):
            return g
        g += 1


# Frobenius / final-exponentiation helper constants (computed, not baked)
@functools.lru_cache(None)
def frob_coeffs():
    """Frobenius coefficients for the Fq2/Fq6/Fq12 tower.

    Tower: Fq2 = Fq[u]/(u^2+1); Fq6 = Fq2[v]/(v^3 - xi); Fq12 = Fq6[w]/(w^2 - v).
    gamma_1[i] = xi^((q-1)*i/6) drives the q-power Frobenius on Fq12.
    """
    out = {}
    for power in (1, 2, 3):
        qq = Q**power
        out[power] = [
            _fq2_pow(XI, i * (qq - 1) // 6) for i in range(6)
        ]
    return out
