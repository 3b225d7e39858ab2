"""Pedersen-style commitment scheme with knowledge component.

TPU-native equivalent of `CommScheme`/`Comm`/`CommOut`
(`/root/reference/src/prototools/commit.h:25-174`): a commitment to a
vector v is the pair (c, kc) with c = <g1s, v> + r*H in G1 and
kc = <g2s, v> in G2 (the "knowledge" leg used by pairing checks).

Differences from the reference, per SURVEY §7 step 3: the reference
fills every base with the *generator* and hardcodes r = 0
(`commit.h:129-158`, "XXX: Ignored") as a benchmarking shortcut. Here
`keygen(..., benchmark_compat=True)` reproduces that exactly, while the
default samples real bases g1s[i] = s_i*G1, g2s[i] = s_i*G2 from a seed
and uses caller-supplied randomness.

Layout: Fr vectors are [L, n] (see fields/limb.py); point batches have
their batch on the vector axis. A batch commit is two MSMs per vector,
jitted and shardable.
"""
from __future__ import annotations

from typing import NamedTuple, Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import (
    Point, G1, G2, FR_OPS, g1_generator, g2_generator, point_map,
)
from ..curve import msm as msm_mod
from ..utils import rand as lrand

FR = bn254.FR


class Comm(NamedTuple):
    """Commitment + knowledge counterpart (`commit.h:25-53`)."""

    c: Point   # G1
    kc: Point  # G2

    def __add__(self, other: "Comm") -> "Comm":
        return Comm(G1.add(self.c, other.c), G2.add(self.kc, other.kc))

    def __sub__(self, other: "Comm") -> "Comm":
        return Comm(G1.add(self.c, G1.neg(other.c)),
                    G2.add(self.kc, G2.neg(other.kc)))

    def scale(self, b_canonical) -> "Comm":
        """b * Comm for a canonical Fr scalar [L, 1]."""
        return Comm(G1.scalar_mul(self.c, b_canonical),
                    G2.scalar_mul(self.kc, b_canonical))


class CommOut(NamedTuple):
    """Commitment + opening randomness + message (`commit.h:59-116`)."""

    c: Comm
    r: Any   # Fr mont [L, 1]
    xs: Any  # Fr mont [L, m]

    def __add__(self, other: "CommOut") -> "CommOut":
        return CommOut(self.c + other.c, FR_OPS.add(self.r, other.r),
                       FR_OPS.add(self.xs, other.xs))

    def __sub__(self, other: "CommOut") -> "CommOut":
        return CommOut(self.c - other.c, FR_OPS.sub(self.r, other.r),
                       FR_OPS.sub(self.xs, other.xs))


class CommitmentKey(NamedTuple):
    g1s: Point  # [.., L, n] G1 bases
    g2s: Point  # [.., L, n] G2 bases
    h: Point    # blinding base in G1
    h2: Point   # G2 mirror of h (same discrete log), so the knowledge
    #             leg can carry the blinding randomness: with
    #             kc = <g2s, v> + r*h2 the pairing check
    #             e(c, g2_0) == e(g1_0, kc) stays sound for r != 0 —
    #             the reference dodges this by hardcoding r = 0
    #             (`commit.h:151-152` "XXX: Ignored")


def keygen(n: int, seed: int = 0, benchmark_compat: bool = False,
           return_scalars: bool = False):
    """Commitment-key generation (`commit.h:129-143`).

    benchmark_compat=True: every base (and H) is the generator, exactly
    like the reference. Default: bases are s_i*G for seeded uniform s_i
    (fixed-base windowed table, the `simpleBatchExp` path of
    `/root/reference/src/utils/util.h:119-134`).

    return_scalars=True additionally returns the canonical base scalars
    [L, n+1] (bases then blinding) — the `scalarsAvailable` notion of
    `/root/reference/src/gadgets/subspace.h:19`: relations over these
    bases can run the scalar fast keygen path.
    """
    if benchmark_compat:
        ck = CommitmentKey(
            g1_generator((n,)), g2_generator((n,)), g1_generator(),
            g2_generator())
        if return_scalars:
            ones = jnp.asarray(fl.ints_to_limbs([1] * (n + 1), FR.nlimbs))
            return ck, ones
        return ck

    rng = np.random.default_rng(seed ^ 0x1E605)
    scal = lrand.rand_fr_canonical(rng, n + 1)   # [L, n+1]

    t1 = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    t2 = msm_mod.fixed_base_table(G2, g2_generator(), c=8)
    g1s = msm_mod.batch_scalar_mul(G1, t1, scal, c=8)
    g2s = msm_mod.batch_scalar_mul(G2, t2, scal, c=8)
    h = point_map(lambda x: x[..., n : n + 1], g1s)
    h2 = point_map(lambda x: x[..., n : n + 1], g2s)
    g1s = point_map(lambda x: x[..., :n], g1s)
    g2s = point_map(lambda x: x[..., :n], g2s)
    ck = CommitmentKey(g1s, g2s, h, h2)
    if return_scalars:
        return ck, scal
    return ck


def commit(ck: CommitmentKey, v_mont, r_mont=None, c: int | None = None
           ) -> CommOut:
    """Commit to a vector v (Montgomery Fr [L, m]), m <= n.

    c = <g1s[:m], v> + r*H ; kc = <g2s[:m], v>  (`commit.h:149-158`).
    r defaults to zero (the reference behavior); pass real randomness
    for hiding commitments.
    """
    m = v_mont.shape[-1]
    v_can = fl.from_mont(FR, v_mont)
    g1s = point_map(lambda x: x[..., :m], ck.g1s)
    g2s = point_map(lambda x: x[..., :m], ck.g2s)
    cpt = msm_mod.msm(G1, g1s, v_can, c=c)
    kc = msm_mod.msm(G2, g2s, v_can, c=c)
    if r_mont is None:
        r_mont = FR_OPS.zero()
    else:
        r_can = fl.from_mont(FR, r_mont)
        cpt = G1.add(cpt, G1.scalar_mul(ck.h, r_can))
        # knowledge leg carries the same randomness over h2 so the
        # pairing well-formedness check holds for blinded commitments
        kc = G2.add(kc, G2.scalar_mul(ck.h2, r_can))
    return CommOut(Comm(cpt, kc), r_mont, v_mont)


def commit_scalar(ck: CommitmentKey, v_mont) -> CommOut:
    """Commit to a single field element (`commit.h:160-166`):
    c = v*g1s[0], kc = v*g2s[0]. v_mont: [L, 1]."""
    v_can = fl.from_mont(FR, v_mont)
    g1 = point_map(lambda x: x[..., :1], ck.g1s)
    g2 = point_map(lambda x: x[..., :1], ck.g2s)
    return CommOut(
        Comm(G1.scalar_mul(g1, v_can), G2.scalar_mul(g2, v_can)),
        FR_OPS.zero(), v_mont)


def check_knowledge(ck: CommitmentKey, cm: Comm,
                    g2_gen: Optional[Point] = None):
    """Pairing well-formedness check — used by CPpoly's `checkCommit`
    (`/root/reference/src/gadgets/poly.h:34-36`): e(c, g2) == e(g1, kc)
    with (g1, g2) the first bases."""
    from ..curve import pairing as pr
    g1 = point_map(lambda x: x[..., :1], ck.g1s)
    g2 = point_map(lambda x: x[..., :1], ck.g2s)
    lhs = pr.point_concat([cm.c, G1.neg(g1)])
    rhs = pr.point_concat([g2, cm.kc])
    return pr.pairing_product_is_one(lhs, rhs)
