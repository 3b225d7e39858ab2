"""CPsc — generalized commit-and-prove sumcheck argument.

TPU-native, sound re-design of `CPSumcheck`/`CPSumcheckMatrix`
(`/root/reference/src/gadgets/sumcheck.{h,cc}`). Protocol shape is the
reference's exactly:

  prover: d rounds producing univariate h_i (degree = #tables), each
          committed coefficient-wise with scalar Pedersen commitments;
          per-round ZKEq proof that h_i(0)+h_i(1) equals the running
          claim z_i (homomorphically evaluated on commitments,
          `sumcheck.cc:84-92`); CPpoly openings of the committed MLEs
          at the round challenges (`sumcheck.cc:95-102`); one ZKPrd
          proof that z_d = beta(rho, r) * a~(r) * b~(r)
          (`sumcheck.cc:104-107`).
  verifier: replays the homomorphic round checks (`sumcheck.cc:155-163`)
          via evalAsPolyOn over commitments (`polytools.h:104-113`),
          checks the CPpoly proofs and the product proof.

Soundness deltas vs the reference: the h-round engine treats beta as a
third MLE table (one generic fold, see prototools.mle) instead of
DPBeta's prefix/suffix machinery; CPpoly openings are against the
ORIGINAL commitments (the reference re-commits the folded tables,
breaking the link); sigma protocols are real. Challenges remain
injectable (the reference prover samples them itself,
`sumcheck.cc:46-48`); pass Fiat-Shamir-derived values for
non-interactive soundness.

Matrix mode (`CPSumcheckMatrix`): the caller pre-folds the matrices
(DPMatrixMle) and supplies open-points for the original 2d-variable
commitments; beta is dummy (== 1).
"""
from __future__ import annotations

from typing import NamedTuple, Any, Optional

import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, FR_OPS
from ..prototools import mle
from . import sigma, poly as cppoly

FR = bn254.FR


class SumcheckProof(NamedTuple):
    """Fixed-shape proof object (cf. `SumcheckPf`, `sumcheck.h:16-44`)."""

    r: Any                 # [d, L] round challenges (mont)
    h_comms: Point         # [d, D+1] G1 scalar commitments to h coeffs
    eq_proofs: sigma.ZKEqProof   # batched [d]
    poly_comms: Any        # tuple of PolyComm for the committed MLEs
    ans_comms: Point       # [2] G1 answer commitments (a~(r), b~(r))
    poly_pfs: Any          # tuple of PolyPf
    prd_proof: sigma.ZKPrdProof
    finals: Any            # [k, L] final table values (mont) — openings


def _stack_points(ps):
    return Point(jnp.stack([p.x for p in ps]),
                 jnp.stack([p.y for p in ps]),
                 jnp.stack([p.z for p in ps]))


def commit_scalar(g: Point, v_mont) -> Point:
    """Deterministic scalar commitment v*G (the reference uses zero
    randomness throughout, `commit.h:151-152`)."""
    return G1.scalar_mul(g, fl.from_mont(FR, v_mont))


def eval_on_comms(comms: Point, t_mont) -> Point:
    """Homomorphic univariate evaluation sum_j t^j * C_j over stacked
    commitment points [k+1] (`polytools.h:104-124`)."""
    k1 = comms.x.shape[0]
    acc = Point(comms.x[k1 - 1], comms.y[k1 - 1], comms.z[k1 - 1])
    t_can = fl.from_mont(FR, t_mont)
    for j in range(k1 - 2, -1, -1):
        acc = G1.scalar_mul(acc, t_can)
        acc = G1.add(acc, Point(comms.x[j], comms.y[j], comms.z[j]))
    return acc


def prove(key: cppoly.PolyKey, tables, challenges, sigma_rand,
          beta_table=None, open_points=None, open_tables=None):
    """Sumcheck prove over a product of the stacked `tables` [2, 2^d, L]
    (the two committed MLEs), optionally times `beta_table` [2^d, L].

    challenges: [d, L] mont round challenges.
    sigma_rand: dict with keys 'eq_k' [d, L], 'eq_e' [d, L],
        'prd_b' [5, L], 'prd_e' [L] — sigma-protocol nonces/challenges.
    open_points / open_tables: where and what CPpoly opens; defaults to
        (challenges, tables) for the plain CPsc; CPMat passes the
        original 2d-variable tables and r||rho' points.
    Returns (proof, z0) with z0 the claimed sum (mont).
    """
    d = challenges.shape[0]
    full = tables if beta_table is None else jnp.concatenate(
        [beta_table[None], tables], axis=0)

    rounds = mle.prove_rounds(full, challenges)   # h_coeffs [d, k+1, L]
    g, h = key.g1, _blinding(key)

    # scalar-commit every h coefficient: [d, k+1] points
    hc_flat = rounds.h_coeffs.reshape(-1, FR.nlimbs)
    h_comms_flat = G1.scalar_mul(
        _bcast(g, hc_flat.shape[0]), fl.from_mont(FR, hc_flat))
    h_comms = jax.tree.map(
        lambda x: x.reshape(rounds.h_coeffs.shape[:2] + x.shape[1:]),
        h_comms_flat)

    # per-round ZKEq proofs: h_i(0)+h_i(1) == z_i (all randomness 0:
    # commitments are deterministic, so r0 == r1 == 0)
    zero = FR_OPS.zero((d,))
    eq_pfs = jax.vmap(
        lambda k_, e_: sigma.zkeq_prove(g, h, FR_OPS.zero(), FR_OPS.zero(),
                                        k_, e_)
    )(sigma_rand["eq_k"], sigma_rand["eq_e"])

    # CPpoly openings of the two committed MLEs
    if open_points is None:
        open_points = (challenges, challenges)
    if open_tables is None:
        open_tables = (tables[0], tables[1])
    ans, ans_c, pfs = [], [], []
    for t, pt in zip(open_tables, open_points):
        a_val, a_com = cppoly.compute_answer(key, t, pt)
        ans.append(a_val)
        ans_c.append(a_com)
        pfs.append(cppoly.prove(key, t, pt))

    # final product proof: z_d = (betaEval * a~(r)) * b~(r)
    beta_eval = (rounds.finals[0] if beta_table is not None
                 else FR_OPS.one())
    if beta_table is not None:
        a_final, b_final = rounds.finals[1], rounds.finals[2]
    else:
        a_final, b_final = rounds.finals[0], rounds.finals[1]
    lhs = FR_OPS.mul(beta_eval, ans[0])
    prd = sigma.zkprd_prove(
        g, h, lhs, FR_OPS.zero(), ans[1], FR_OPS.zero(), FR_OPS.zero(),
        sigma_rand["prd_b"], sigma_rand["prd_e"])

    z0 = rounds.zs[0]
    proof = SumcheckProof(
        r=challenges, h_comms=h_comms, eq_proofs=eq_pfs,
        poly_comms=None, ans_comms=_stack_points(ans_c),
        poly_pfs=tuple(pfs), prd_proof=prd,
        finals=jnp.stack([ans[0], ans[1]]))
    return proof, z0


def verify(key: cppoly.PolyKey, z0_comm: Point, mle_comms, proof,
           sigma_rand, beta_point_fn=None, open_points=None):
    """Sumcheck verify (`sumcheck.cc:135-179`).

    z0_comm: commitment to the claimed sum. mle_comms: tuple of
    PolyComm for the two committed MLEs. beta_point_fn: callable
    r -> beta(rho, r) closed form (None = matrix mode, beta == 1).
    """
    d = proof.r.shape[0]
    g, h = key.g1, _blinding(key)
    checks = []

    z_comm = z0_comm
    for i in range(d):
        hc = Point(proof.h_comms.x[i], proof.h_comms.y[i],
                   proof.h_comms.z[i])
        v0 = eval_on_comms(hc, FR_OPS.zero())
        v1 = eval_on_comms(hc, FR_OPS.one())
        v_comm = G1.add(v0, v1)
        pf_i = jax.tree.map(lambda x: x[i], proof.eq_proofs)
        checks.append(sigma.zkeq_verify(
            h, v_comm, z_comm, sigma.ZKEqProof(*pf_i),
            sigma_rand["eq_e"][i]))
        z_comm = eval_on_comms(hc, proof.r[i])

    # CPpoly checks against the ORIGINAL commitments
    if open_points is None:
        open_points = (proof.r, proof.r)
    for idx, (cm, pt) in enumerate(zip(mle_comms, open_points)):
        ansc = Point(proof.ans_comms.x[idx], proof.ans_comms.y[idx],
                     proof.ans_comms.z[idx])
        checks.append(cppoly.check_commit(key, cm))
        checks.append(cppoly.verify(key, cm, ansc, pt,
                                    proof.poly_pfs[idx]))

    # product proof: lhs = betaEval * ansA, rhs = ansB, out = z_d comm
    beta_eval = (beta_point_fn(proof.r) if beta_point_fn is not None
                 else FR_OPS.one())
    ans_a = Point(proof.ans_comms.x[0], proof.ans_comms.y[0],
                  proof.ans_comms.z[0])
    ans_b = Point(proof.ans_comms.x[1], proof.ans_comms.y[1],
                  proof.ans_comms.z[1])
    lhs_comm = G1.scalar_mul(ans_a, fl.from_mont(FR, beta_eval))
    checks.append(sigma.zkprd_verify(
        g, h, lhs_comm, ans_b, z_comm, proof.prd_proof,
        sigma_rand["prd_e"]))

    out = checks[0]
    for c in checks[1:]:
        out = jnp.logical_and(out, c)
    return out


def _blinding(key: cppoly.PolyKey) -> Point:
    """Blinding base H for scalar commitments. Derived from the SRS:
    use the alpha-shifted generator base (independent of G under DLOG
    given alpha is toxic waste)."""
    return Point(*jax.tree.map(lambda x: x[-1], key.bases_a[key.d]))


def _bcast(p: Point, n: int) -> Point:
    return Point(jnp.broadcast_to(p.x, (n,) + p.x.shape),
                 jnp.broadcast_to(p.y, (n,) + p.y.shape),
                 jnp.broadcast_to(p.z, (n,) + p.z.shape))
