"""Fiat-Shamir transcript: a MiMC-5 sponge over Fr, fully on-device.

The reference has NO transcript at all — every challenge is
prover-sampled `random_element()` (`sumcheck.cc:46-48`, `sigma.cc:14`;
SURVEY §2.1 rows 14/16), i.e. honest-verifier interactive. This module
supplies the non-interactive option: a jit-compatible sponge whose
permutation is x -> (x + c_i)^5 over Fr (5 is coprime to r-1, so x^5
is a permutation; 110 rounds). Batches absorb through a binary
Merkle-Damgard-style tree (log-depth, full vector width) before the
digest enters the running state — sequential rate-1 absorption of a
2^d-entry table would serialize 110*2^d tiny muls on the VPU.

Security note: MiMC-5/110 is a demonstrative algebraic hash (the
standard production choice would be Poseidon2); the transcript API is
what matters — gadgets absorb each commitment before sampling the next
challenge, and `tests/test_transcript_fs.py` checks that a tampered
transcript changes every later challenge.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254

FR = bn254.FR
N_ROUNDS = 110


@functools.lru_cache(None)
def _round_constants():
    """[N_ROUNDS, L, 1] Montgomery host constants (nothing-up-my-
    sleeve: fixed-seed uniform draws)."""
    rng = np.random.default_rng(0xF5)
    vals = [int.from_bytes(rng.bytes(40), "little") % bn254.R
            for _ in range(N_ROUNDS)]
    return np.stack([FR.to_mont_int(v) for v in vals])


def permute(x_mont):
    """110 rounds of x <- (x + c_i)^5 (3 muls per round, batched over
    the vector axis). One `lax.scan` body — an unrolled 330-mul chain
    per absorb made Fiat-Shamir graphs uncompilable on this host."""
    import jax

    def body(x, c):
        t = fl.add(FR, x, c)
        t2 = fl.mont_sqr(FR, t)
        t4 = fl.mont_sqr(FR, t2)
        return fl.mont_mul(FR, t4, t), None

    x_mont = jnp.asarray(x_mont)
    out, _ = jax.lax.scan(body, x_mont, jnp.asarray(_round_constants()))
    return out


def _tree_digest(v):
    """Compress [L, m] columns to one [L, 1] digest: permute all lanes
    once, then log2(m) rounds of pairwise combine+permute."""
    h = permute(v)
    m = h.shape[-1]
    while m > 1:
        half = m // 2
        comb = fl.add(FR, h[..., :half], h[..., half : 2 * half])
        if m % 2:
            comb = jnp.concatenate([comb, h[..., -1:]], axis=-1)
        h = permute(comb)
        m = (m + 1) // 2
    return h


class Transcript:
    """Absorb-then-squeeze sponge. All methods trace under jit."""

    def __init__(self, label: int = 0):
        self.state = fl.const_mont(FR, label % bn254.R)

    def absorb_fr(self, v_mont) -> None:
        """Absorb a batch of Fr elements [..., L, m] (any leading dims)."""
        v = v_mont.reshape(-1, FR.nlimbs, v_mont.shape[-1])
        flat = jnp.concatenate([_as_fr(v[i]) for i in range(v.shape[0])],
                               axis=-1)
        digest = _tree_digest(flat)
        self.state = permute(fl.add(FR, self.state, digest))

    def absorb_point(self, p) -> None:
        """Absorb projective coordinates limb-wise (Fq limbs reinterpreted
        as Fr representatives — deterministic on both sides, which is all
        Fiat-Shamir binding needs)."""
        for coord in (p.x, p.y, p.z):
            self.absorb_fr(coord)

    def challenge(self):
        """Squeeze one Fr challenge [L, 1] (Montgomery form)."""
        self.state = permute(self.state)
        return self.state

    def challenges(self, n: int):
        """[L, n] challenges."""
        return jnp.concatenate([self.challenge() for _ in range(n)],
                               axis=-1)


def _as_fr(limbs):
    """Reduce an arbitrary 13-bit limb array [L, m] to canonical Fr
    elements (mont_mul by R^2 then by 1 is exact for values < R)."""
    t = fl.mont_mul(FR, limbs, fl._dev_const(FR.r2_limbs))
    return fl.mont_mul(FR, t, fl._dev_const(FR.one_std))
