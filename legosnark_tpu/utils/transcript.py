"""Fiat-Shamir transcript: a MiMC-5 sponge over Fr, fully on-device.

The reference has NO transcript at all — every challenge is
prover-sampled `random_element()` (`sumcheck.cc:46-48`, `sigma.cc:14`;
SURVEY §2.1 rows 14/16), i.e. honest-verifier interactive. This module
supplies the non-interactive option: a jit-compatible sponge whose
permutation is x -> (x + c_i)^5 over Fr (5 is coprime to r-1, so x^5
is a permutation; 110 rounds). Points are absorbed coordinate-wise.

Security note: MiMC-5/110 is a demonstrative algebraic hash (the
standard production choice would be Poseidon2); the transcript API is
what matters — gadgets absorb each commitment before sampling the next
challenge.
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
    rng = np.random.default_rng(0xF5)
    cs = np.empty((N_ROUNDS, FR.nlimbs), dtype=np.uint32)
    for i in range(N_ROUNDS):
        v = (int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
             + int(rng.integers(0, 1 << 62))) % bn254.R
        cs[i] = FR.to_mont_int(v)
    return cs


def permute(x_mont):
    """110 rounds of x <- (x + c_i)^5 (3 muls per round, batched)."""
    cs = jnp.asarray(_round_constants())
    for i in range(N_ROUNDS):
        t = fl.add(FR, x_mont, cs[i])
        t2 = fl.mont_sqr(FR, t)
        t4 = fl.mont_sqr(FR, t2)
        x_mont = fl.mont_mul(FR, t4, t)
    return x_mont


class Transcript:
    """Absorb-then-squeeze sponge. All methods trace under jit."""

    def __init__(self, label: int = 0):
        self.state = jnp.asarray(FR.to_mont_int(label % bn254.R))

    def absorb_fr(self, v_mont) -> None:
        v = v_mont.reshape(-1, FR.nlimbs)
        for i in range(v.shape[0]):
            self.state = permute(fl.add(FR, self.state, _as_fr(v[i])))

    def absorb_point(self, p) -> None:
        """Absorb projective coordinates limb-wise (Fq limbs reinterpreted
        as Fr representatives — deterministic on both sides)."""
        for coord in (p.x, p.y, p.z):
            flat = coord.reshape(-1, coord.shape[-1])
            for i in range(flat.shape[0]):
                self.state = permute(
                    fl.add(FR, self.state, _as_fr(flat[i])))

    def challenge(self):
        """Squeeze one Fr challenge (Montgomery form)."""
        self.state = permute(self.state)
        return self.state

    def challenges(self, n: int):
        return jnp.stack([self.challenge() for _ in range(n)])


def _as_fr(limbs):
    """Reduce an arbitrary 13-bit limb vector to a canonical Fr element
    (value < R < 2^260: one Montgomery mul by R^2 then by 1 would be
    exact; a single cond-sub chain suffices for sponge use since we
    only need determinism + near-uniformity)."""
    one = np.zeros((FR.nlimbs,), dtype=np.uint32)
    one[0] = 1
    # mont_mul(x, R2) = x*R mod p (canonical); then *R^-1 via mont one
    t = fl.mont_mul(FR, limbs, jnp.asarray(FR.r2_limbs))
    return fl.mont_mul(FR, t, jnp.asarray(one))
