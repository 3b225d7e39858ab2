"""Radix-2 NTT over Fr + evaluation-domain utilities.

TPU-native replacement for libfqfft's `evaluation_domain` as used by
the reference's Interpolator and Lipmaa pipeline
(`/root/reference/src/prototools/interp.{h,cc}`,
`/root/reference/src/gadgets/lipmaa.cc:94-185`): FFT/iFFT,
cosetFFT/icosetFFT, `divide_by_Z_on_coset`,
`evaluate_all_lagrange_polynomials`, vanishing polynomial.

Design: decimation-in-time butterflies as a Python loop over the
*static* log2(n) stages; each stage is one fully vectorized Montgomery
mul + add/sub over the whole array (XLA fuses the reshape/concat
shuffles). Twiddle tables are host-precomputed per (n, stage) from the
public BN254 2-adic root (2-adicity 28) and become jit constants.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254

FR = bn254.FR
R = bn254.R


@functools.lru_cache(None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle tables (Montgomery limbs) for a size-2^log_n
    DIT NTT: stage s uses w_{2^s}^j for j < 2^(s-1)."""
    root = bn254.fr_two_adic_root(log_n)
    if inverse:
        root = pow(root, R - 2, R)
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(root, (1 << log_n) // m, R)
        tw = np.empty((m // 2, FR.nlimbs), dtype=np.uint32)
        w = 1
        for j in range(m // 2):
            tw[j] = FR.to_mont_int(w)
            w = w * w_m % R
        out.append(tw)
    return out


@functools.lru_cache(None)
def _bitrev(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def ntt(a, inverse: bool = False):
    """In-order DIT NTT of [n, L] Montgomery coefficients -> evals at
    the powers of the canonical 2^log_n root (inverse: evals -> coeffs,
    including the 1/n scale)."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    a = a[jnp.asarray(_bitrev(log_n))]
    tws = _stage_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << s
        tw = jnp.asarray(tws[s - 1])                 # [m/2, L]
        x = a.reshape(n // m, m, FR.nlimbs)
        even = x[:, : m // 2]
        odd = fl.mont_mul(FR, x[:, m // 2 :], tw[None])
        a = jnp.concatenate(
            [fl.add(FR, even, odd), fl.sub(FR, even, odd)],
            axis=1).reshape(n, FR.nlimbs)
    if inverse:
        n_inv = jnp.asarray(FR.to_mont_int(pow(n, R - 2, R)))
        a = fl.mont_mul(FR, a, n_inv[None])
    return a


def intt(a):
    return ntt(a, inverse=True)


@functools.lru_cache(None)
def _coset_powers(log_n: int, inverse: bool):
    """g^i (or g^-i) for the multiplicative-generator coset shift,
    Montgomery limbs [n, L] — libfqfft's cosetFFT multiplier."""
    g = bn254.fr_multiplicative_generator()
    if inverse:
        g = pow(g, R - 2, R)
    n = 1 << log_n
    out = np.empty((n, FR.nlimbs), dtype=np.uint32)
    acc = 1
    for i in range(n):
        out[i] = FR.to_mont_int(acc)
        acc = acc * g % R
    return out


def coset_ntt(a):
    """Evaluate on the coset g*<w> (`lipmaa.cc:136-176` path)."""
    log_n = a.shape[0].bit_length() - 1
    shift = jnp.asarray(_coset_powers(log_n, False))
    return ntt(fl.mont_mul(FR, a, shift))


def coset_intt(a):
    log_n = a.shape[0].bit_length() - 1
    shift = jnp.asarray(_coset_powers(log_n, True))
    return fl.mont_mul(FR, intt(a), shift)


def divide_by_z_on_coset(evals):
    """Divide coset evaluations by Z(x) = x^n - 1, which is the
    CONSTANT g^n - 1 on the coset (libfqfft `divide_by_Z_on_coset`)."""
    n = evals.shape[0]
    g = bn254.fr_multiplicative_generator()
    zinv = pow((pow(g, n, R) - 1) % R, R - 2, R)
    return fl.mont_mul(FR, evals, jnp.asarray(FR.to_mont_int(zinv))[None])


def poly_mul_ntt(a, b):
    """Polynomial product via zero-padded NTT (libfqfft
    `_polynomial_multiplication`); inputs [na, L], [nb, L]."""
    na, nb = a.shape[0], b.shape[0]
    n = 1
    while n < na + nb - 1:
        n *= 2
    pad = lambda v: jnp.concatenate(
        [v, fl.zero(FR, (n - v.shape[0],))], axis=0)
    fa = ntt(pad(a))
    fb = ntt(pad(b))
    return intt(fl.mont_mul(FR, fa, fb))[: na + nb - 1]


# ---------------------------------------------------------------------------
# Interpolator-style domain queries (`interp.h:68-78`)
# ---------------------------------------------------------------------------


def vanishing_at(n: int, t_mont):
    """Z(t) = t^n - 1 (libfqfft `compute_vanishing_polynomial`)."""
    tn = fl.mont_pow(FR, t_mont, n)
    return fl.sub(FR, tn, fl.one(FR))


def all_lagrange_at(n: int, t_mont):
    """All n Lagrange-basis polys evaluated at t:
    l_i(t) = (t^n - 1) * w^i / (n * (t - w^i))  — the batched form of
    libfqfft `evaluate_all_lagrange_polynomials` used by
    `Interpolator::getAllLagrangianPolys` (`interp.h:68-72`)."""
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    root = bn254.fr_two_adic_root(log_n)
    ws = np.empty((n, FR.nlimbs), dtype=np.uint32)
    acc = 1
    for i in range(n):
        ws[i] = FR.to_mont_int(acc)
        acc = acc * root % R
    ws = jnp.asarray(ws)                                   # w^i, mont

    z = vanishing_at(n, t_mont)                            # t^n - 1
    n_inv = jnp.asarray(FR.to_mont_int(pow(n, R - 2, R)))
    num = fl.mont_mul(FR, fl.mont_mul(FR, ws, z[None]), n_inv[None])
    den = fl.sub(FR, jnp.broadcast_to(t_mont, ws.shape), ws)
    return fl.mont_mul(FR, num, fl.inv(FR, den))
