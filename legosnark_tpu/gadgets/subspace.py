"""CPlink — Kiltz–Wee QA-NIZK subspace argument.

TPU-native re-design of `SubspaceSnark`
(`/root/reference/src/gadgets/subspace.{h,cc}`). Proves x = M*w for a
public matrix M of G1 elements and committed x (the LegoSNARK CPlink
gadget: "these two commitments open to the same vector").

  keygen (`subspace.cc:37-76`): sample k in Fr^l, a_hat in Fr;
      P = M^T k in G1^t, C_i = k_i * a in G2^l, a = a_hat * G2.
  prove (`subspace.cc:78-85`): ONE t-point MSM  pi = <P, w>.
  verify (`subspace.cc:106-133`): prod_i e(x_i, C_i) == e(pi, a),
      realized as a single batched product-of-pairings == 1 (identity
      x_i legs are masked out exactly like the reference's skip-zeros).
      `verifyLin3or4` (`subspace.cc:135-171`) is this same code at
      l = 3, 4 — no special-casing needed.

Sparsity: the reference stores M column-major sparse. Here M is a
dense [l, t] Point batch with *identity points as zeros* — the
complete addition law makes zero entries behave exactly like skipped
entries, and the keygen contraction P = sum_i k_i * M[i, :] is l
batched scalar-muls (fully vectorized) instead of per-column sparse
MSMs. For the linking relations l is 2-4, so this is the right
TPU shape.
"""
from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, G2, FR_OPS, g2_generator
from ..curve import msm as msm_mod

FR = bn254.FR


class SubspaceKey(NamedTuple):
    P: Point   # [t] G1
    C: Point   # [l] G2
    a: Point   # G2


def _rand_fr(rng) -> int:
    return (int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
            + int(rng.integers(0, 1 << 62))) % bn254.R


def keygen(M: Point, seed: int = 0) -> SubspaceKey:
    """M: [l, t] G1 points (identity = structural zero)."""
    l = M.x.shape[0]
    rng = np.random.default_rng(seed ^ 0x5AB5)
    k_ints = [_rand_fr(rng) for _ in range(l)]
    a_hat = _rand_fr(rng)

    k_can = jnp.asarray(
        np.stack([fl.int_to_limbs(x, FR.nlimbs) for x in k_ints]))

    # P = sum_i k_i * M[i, :]  — batched scalar-mul per row, tree add
    scaled = G1.scalar_mul(M, k_can[:, None, :])   # [l, t]
    P = msm_mod._tree_reduce_axis0(G1, scaled)

    # C_i = k_i * a = (k_i * a_hat) * G2
    ka = jnp.asarray(np.stack([
        fl.int_to_limbs(x * a_hat % bn254.R, FR.nlimbs) for x in k_ints]))
    C = G2.scalar_mul(g2_generator((l,)), ka)
    a = G2.scalar_mul(g2_generator(),
                      jnp.asarray(fl.int_to_limbs(a_hat, FR.nlimbs)))
    return SubspaceKey(P=P, C=C, a=a)


def prove(key: SubspaceKey, w_mont) -> Point:
    """pi = <P, w> — the single hot MSM (`subspace.cc:78-85`)."""
    return msm_mod.msm(G1, key.P, fl.from_mont(FR, w_mont))


def verify(key: SubspaceKey, x: Point, pi: Point):
    """prod_i e(x_i, C_i) * e(-pi, a) == 1 (`subspace.cc:106-133`)."""
    from ..curve import pairing as pr
    npi = G1.neg(pi)
    g1s = Point(
        jnp.concatenate([x.x, npi.x[None]]),
        jnp.concatenate([x.y, npi.y[None]]),
        jnp.concatenate([x.z, npi.z[None]]))
    g2s = Point(
        jnp.concatenate([key.C.x, key.a.x[None]]),
        jnp.concatenate([key.C.y, key.a.y[None]]),
        jnp.concatenate([key.C.z, key.a.z[None]]))
    return pr.pairing_product_is_one(g1s, g2s)


# ---------------------------------------------------------------------------
# Linking-relation builder (the cplink example shape)
# ---------------------------------------------------------------------------


def make_linking_relation(h: Point, f: Point, bases_h: Point,
                          bases_f: Point) -> Point:
    """Build the 2 x (2 + N) relation of `examples/cplink.cc:17-41`:

        [ h  0  g_1 ... g_N ]
        [ 0  f  f_1 ... f_N ]

    witness w = (r_h, r_f, u_1..u_N); x = (c_H, c_F) the two
    commitments to the same u under base sets (g_i), (f_i).
    """
    n = bases_h.x.shape[0]
    idg = G1.identity((1,))

    def row(first, second, bases):
        return Point(
            jnp.concatenate([first.x[None], second.x, bases.x]),
            jnp.concatenate([first.y[None], second.y, bases.y]),
            jnp.concatenate([first.z[None], second.z, bases.z]))

    row0 = row(h, idg, bases_h)
    id_then_f = Point(
        jnp.concatenate([idg.x, f.x[None]]),
        jnp.concatenate([idg.y, f.y[None]]),
        jnp.concatenate([idg.z, f.z[None]]))
    row1 = Point(
        jnp.concatenate([id_then_f.x, bases_f.x]),
        jnp.concatenate([id_then_f.y, bases_f.y]),
        jnp.concatenate([id_then_f.z, bases_f.z]))
    # row0 currently = [h, id, g...]; fix ordering: [h, 0, g...] OK
    return Point(
        jnp.stack([row0.x, row1.x]),
        jnp.stack([row0.y, row1.y]),
        jnp.stack([row0.z, row1.z]))
