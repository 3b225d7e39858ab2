"""CPAC — arithmetic-circuit CP-SNARK (Hadamard ∘ Linear composition).

The reference's `arithcirc.{h,cc}` is DEAD CODE (excluded from the
build, depends on a removed Eigen matrix layer — SURVEY §2.1 row 22).
This module implements the *capability* from the LegoSNARK paper
recipe using the working pieces, as `arithcirc.cc:34-117` intended:

  circuit with n multiplication gates and m linear constraints
  W * (l || r || o) = t  over committed wire vectors l, r, o:

  * CPhadL proves the gate products  o = l ⊙ r        (gadgets.lipmaa)
  * SubspaceSnark proves the wiring: the linking matrix

        [ Z(chi)G      0        0     | L_1..L_n   0      0    ]
        [   0       Z(chi)G     0     |   0      L_1..n   0    ]
        [   0          0     Z(chi)G  |   0        0    L_1..n ]
        [   0          0        0     |        W_{ij} * G      ]

    with witness w = (d1, d2, d3, l, r, o) maps to
    x = (ca, cb, cc, t_1*G .. t_m*G) — simultaneously re-deriving the
    three commitments (binding the two sub-proofs to the same wires,
    the `[h0*I | bases | 0; 0 | F]` block structure of
    `arithcirc.cc:34-78`) and enforcing the linear constraints.

Layout: wire vectors [L, n]; relation matrix rows stack on a leading
axis with entries on the vector axis (see fields/limb.py).
"""
from __future__ import annotations

from typing import NamedTuple, Any, List

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, g1_generator, point_stack, point_map
from ..curve.pairing import point_concat
from ..curve import msm as msm_mod
from . import lipmaa, subspace

FR = bn254.FR
R = bn254.R


class ACRel(NamedTuple):
    """n gates; W: [m, 3n] int constraint matrix; t: [m] int publics."""

    n: int
    W: Any    # numpy object array of ints
    t: Any    # list of ints


class ACKey(NamedTuple):
    hadl_key: Any          # lipmaa.HadLKey
    ss_key: Any            # subspace.SubspaceKey
    t_points: Point        # [L, m] t_i * G (the public right-hand side)


class ACProof(NamedTuple):
    ca: Any                # InterpComm for l
    cb: Any                # InterpComm for r
    cc: Any                # InterpComm for o
    had_pi: Point
    lin_pi: Point


def proof_size_group_elements() -> dict:
    """3 commitments (G1+G2 legs) + 2 proof points."""
    return {"g1": 5, "g2": 3, "fr": 0}


def keygen(rel: ACRel, seed: int = 0) -> ACKey:
    """`CPAC::keygen` intent (`arithcirc.cc:106-160`)."""
    n, m = rel.n, len(rel.t)
    hk = lipmaa.keygen(n, seed=seed)
    lag = hk.interp.lag_g1          # [L, n] l_i(chi) G
    zg = hk.interp.z_g1             # [L, 1]

    id1 = G1.identity(())
    idn = G1.identity((n,))

    def row_commit(slot: int) -> Point:
        blocks = [zg if j == slot else id1 for j in range(3)]
        blocks += [lag if j == slot else idn for j in range(3)]
        return point_concat(blocks)

    # wiring rows: W_{ij} * G via fixed-base batch mul
    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    w_flat = [int(v) % R for v in np.asarray(rel.W, dtype=object).reshape(-1)]
    w_limbs = jnp.asarray(fl.ints_to_limbs(w_flat, FR.nlimbs))  # [L, m*3n]
    w_pts = msm_mod.batch_scalar_mul(G1, table, w_limbs, c=8)
    w_pts = point_map(
        lambda x: jnp.moveaxis(x.reshape(x.shape[:-1] + (m, 3 * n)), -2, 0),
        w_pts)                       # [m, L, 3n]

    M_top = point_stack([row_commit(0), row_commit(1), row_commit(2)])
    idm3 = G1.identity((m, 3))       # [m, L, 3]
    M_bot = point_map(lambda a, b: jnp.concatenate([a, b], axis=-1),
                      idm3, w_pts)   # [m, L, 3+3n]
    M = point_map(lambda a, b: jnp.concatenate([a, b], axis=0),
                  M_top, M_bot)      # [3+m, L, 3+3n]

    ss_key = subspace.keygen(M, seed=seed ^ 0xAC)

    t_limbs = jnp.asarray(fl.ints_to_limbs(
        [int(v) % R for v in rel.t], FR.nlimbs))
    t_points = msm_mod.batch_scalar_mul(G1, table, t_limbs, c=8)
    return ACKey(hk, ss_key, t_points)


def prove(key: ACKey, l_mont, r_mont, o_mont, d_mont) -> ACProof:
    """`CPAC::prove` intent (`arithcirc.cc:163-219`): commit wires,
    CPhadL for gates, one subspace MSM for wiring+linking.
    d_mont: [L, 3] commitment randomness."""
    ca = lipmaa.commit(key.hadl_key.interp, l_mont, d_mont[..., 0:1])
    cb = lipmaa.commit(key.hadl_key.interp, r_mont, d_mont[..., 1:2])
    cc = lipmaa.commit(key.hadl_key.interp, o_mont, d_mont[..., 2:3])
    had_pi = lipmaa.prove(key.hadl_key, l_mont, r_mont, o_mont, d_mont)
    w = jnp.concatenate([d_mont, l_mont, r_mont, o_mont], axis=-1)
    lin_pi = subspace.prove(key.ss_key, w)
    return ACProof(ca, cb, cc, had_pi, lin_pi)


def verify(key: ACKey, proof: ACProof):
    """`CPAC::verify` intent (`arithcirc.cc:222-273`)."""
    had_ok = lipmaa.verify(key.hadl_key, proof.ca, proof.cb, proof.cc,
                           proof.had_pi)
    x = point_concat([proof.ca.c, proof.cb.c, proof.cc.c, key.t_points])
    lin_ok = subspace.verify(key.ss_key, x, proof.lin_pi)
    wf = jnp.logical_and(
        lipmaa.check_commit(key.hadl_key.interp, proof.ca),
        jnp.logical_and(
            lipmaa.check_commit(key.hadl_key.interp, proof.cb),
            lipmaa.check_commit(key.hadl_key.interp, proof.cc)))
    return jnp.logical_and(jnp.all(had_ok),
                           jnp.logical_and(jnp.all(lin_ok), jnp.all(wf)))
