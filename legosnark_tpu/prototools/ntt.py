"""Radix-2 NTT over Fr + evaluation-domain utilities.

TPU-native replacement for libfqfft's `evaluation_domain` as used by
the reference's Interpolator and Lipmaa pipeline
(`/root/reference/src/prototools/interp.{h,cc}`,
`/root/reference/src/gadgets/lipmaa.cc:94-185`): FFT/iFFT,
cosetFFT/icosetFFT, `divide_by_Z_on_coset`,
`evaluate_all_lagrange_polynomials`, vanishing polynomial.

Design: decimation-in-time butterflies as a Python loop over the
*static* log2(n) stages; each stage is one fully vectorized Montgomery
mul + add/sub over the whole array, with the shuffles expressed as
contiguous reshapes of the two minor axes (coefficients live on the
vector/lane axis: [..., L, n] — see fields/limb.py). Twiddle and
power tables are computed ON DEVICE by repeated-doubling (log n
Montgomery muls of growing width) and cached per size — no host bigint
loops, so a 2^20-point domain sets up in milliseconds.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254

FR = bn254.FR
R = bn254.R


@functools.lru_cache(None)
def _powers(base: int, log_n: int):
    """[L, 2^log_n] Montgomery powers base^0..base^(2^log_n - 1),
    computed on device with log_n vectorized muls (doubling trick),
    cached as a HOST array (never a tracer, never device-resident)."""
    with jax.ensure_compile_time_eval():
        t = jnp.asarray(FR.to_mont_int(1))
        for k in range(log_n):
            g2k = jnp.asarray(FR.to_mont_int(pow(base, 1 << k, R)))
            t = jnp.concatenate([t, fl.mont_mul(FR, t, g2k)], axis=-1)
    # HOST copy: device-resident constants closed over by jits hang
    # MLIR lowering on tunneled backends (see limb._dev_const)
    return np.asarray(jax.device_get(t))


def _stage_twiddle(log_n: int, s: int, inverse: bool):
    """Twiddles w_m^j, j < m/2 for stage s (m = 2^s): [L, m/2]."""
    root = bn254.fr_two_adic_root(log_n)
    if inverse:
        root = pow(root, R - 2, R)
    m = 1 << s
    w_m = pow(root, (1 << log_n) // m, R)
    return _powers(w_m, s - 1)


@functools.lru_cache(None)
def _bitrev(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def ntt(a, inverse: bool = False):
    """In-order DIT NTT of [..., L, n] Montgomery coefficients -> evals
    at the powers of the canonical 2^log_n root (inverse: evals ->
    coeffs, including the 1/n scale)."""
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    a = jnp.take(a, jnp.asarray(_bitrev(log_n)), axis=-1)
    lead = a.shape[:-1]                       # [..., L]
    for s in range(1, log_n + 1):
        m = 1 << s
        tw = _stage_twiddle(log_n, s, inverse)          # [L, m/2]
        x = a.reshape(lead + (n // m, m))
        even = x[..., : m // 2].reshape(lead + (n // 2,))
        odd = x[..., m // 2 :].reshape(lead + (n // 2,))
        # twiddle pattern repeats per block: broadcast [L, m/2] across
        # the n//m blocks via reshape of the vector axis
        tw_full = jnp.broadcast_to(
            tw[..., None, :], tw.shape[:-1] + (n // m, m // 2)
        ).reshape(tw.shape[:-1] + (n // 2,))
        odd = fl.mont_mul(FR, odd, tw_full)
        hi = fl.add(FR, even, odd).reshape(lead + (n // m, m // 2))
        lo = fl.sub(FR, even, odd).reshape(lead + (n // m, m // 2))
        a = jnp.concatenate([hi, lo], axis=-1).reshape(lead + (n,))
    if inverse:
        n_inv = fl.const_mont(FR, pow(n, R - 2, R))
        a = fl.mont_mul(FR, a, n_inv)
    return a


def intt(a):
    return ntt(a, inverse=True)


def coset_ntt(a):
    """Evaluate on the coset g*<w> (`lipmaa.cc:136-176` path)."""
    log_n = a.shape[-1].bit_length() - 1
    shift = _powers(bn254.fr_multiplicative_generator(), log_n)
    return ntt(fl.mont_mul(FR, a, shift))


def coset_intt(a):
    log_n = a.shape[-1].bit_length() - 1
    g = bn254.fr_multiplicative_generator()
    shift = _powers(pow(g, R - 2, R), log_n)
    return fl.mont_mul(FR, intt(a), shift)


def divide_by_z_on_coset(evals):
    """Divide coset evaluations by Z(x) = x^n - 1, which is the
    CONSTANT g^n - 1 on the coset (libfqfft `divide_by_Z_on_coset`)."""
    n = evals.shape[-1]
    g = bn254.fr_multiplicative_generator()
    zinv = pow((pow(g, n, R) - 1) % R, R - 2, R)
    return fl.mont_mul(FR, evals, fl.const_mont(FR, zinv))


def poly_mul_ntt(a, b):
    """Polynomial product via zero-padded NTT (libfqfft
    `_polynomial_multiplication`); inputs [..., L, na], [..., L, nb]."""
    na, nb = a.shape[-1], b.shape[-1]
    n = 1
    while n < na + nb - 1:
        n *= 2
    def pad(v):
        z = fl.zero(FR, v.shape[:-2] + (n - v.shape[-1],))
        return jnp.concatenate([v, z], axis=-1)
    fa = ntt(pad(a))
    fb = ntt(pad(b))
    return intt(fl.mont_mul(FR, fa, fb))[..., : na + nb - 1]


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
    `Interpolator::getAllLagrangianPolys` (`interp.h:68-72`).
    t_mont: [L, 1]; returns [L, n]."""
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    ws = _powers(bn254.fr_two_adic_root(log_n), log_n)     # w^i, [L, n]

    z = vanishing_at(n, t_mont)                            # t^n - 1
    n_inv = fl.const_mont(FR, pow(n, R - 2, R))
    num = fl.mont_mul(FR, fl.mont_mul(FR, ws, z), n_inv)
    den = fl.sub(FR, t_mont, ws)
    return fl.mont_mul(FR, num, fl.inv(FR, den))
