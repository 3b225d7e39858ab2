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
breaking the link); sigma protocols are real; and the DEFAULT mode is
non-interactive Fiat-Shamir — pass a `Transcript` and every challenge
(round r_i, sigma challenges) is squeezed after absorbing the
corresponding commitments. The reference's honest-verifier mode
(prover-injected challenges, `sumcheck.cc:46-48`) remains available by
passing explicit `challenges`/`eq_e`/`prd_e`.

Matrix mode (`CPSumcheckMatrix`): the caller pre-folds the matrices
(DPMatrixMle) and supplies open-points for the original 2d-variable
commitments; beta is dummy (== 1).

Layout: tables [k, L, 2^d]; challenge lists [L, d]; scalars [L, 1].
"""
from __future__ import annotations

from typing import NamedTuple, Any, Optional

import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, FR_OPS, point_map
from ..curve.pairing import point_concat
from ..prototools import mle, polytools
from . import sigma, poly as cppoly

FR = bn254.FR


class SumcheckProof(NamedTuple):
    """Fixed-shape proof object (cf. `SumcheckPf`, `sumcheck.h:16-44`)."""

    r: Any                 # [L, d] round challenges (mont)
    h_comms: Point         # [d, L, D+1] G1 scalar commitments to h coeffs
    eq_proofs: sigma.ZKEqProof   # batched on the vector axis [L, d]
    ans_comms: Point       # [L, 2] G1 answer commitments (a~(r), b~(r))
    poly_pfs: Any          # tuple of PolyPf
    prd_proof: sigma.ZKPrdProof
    finals: Any            # [L, 2] final answers (mont) — openings


def proof_size_group_elements(d: int, k: int) -> dict:
    """`SumcheckPf::getSize` parity (`sumcheck.h:35-43`)."""
    return {
        "g1": d * (k + 1)        # h coefficient commitments
        + d + 2                  # eq first moves + ans commitments
        + 3                      # prd first moves
        + 2 * 2 * d,             # two CPpoly proofs
        "g2": 0,
        "fr": d + 5 + 2,         # eq responses, prd responses, finals
    }


def commit_scalar(g: Point, v_mont) -> Point:
    """Deterministic scalar commitment v*G (the reference uses zero
    randomness throughout, `commit.h:151-152`). Batched: v [L, m] ->
    points [L, m]."""
    return G1.scalar_mul(g, fl.from_mont(FR, v_mont))


def prove(key: cppoly.PolyKey, tables, rand, beta_table=None,
          open_points=None, open_tables=None, open_points_fn=None,
          challenges=None, transcript=None, staged=False):
    """Sumcheck prove over a product of the stacked `tables` [2, L, 2^d]
    (the two committed MLEs), optionally times `beta_table` [L, 2^d].

    rand: dict of prover NONCES: 'eq_k' [L, d], 'prd_b' [L, 5] — plus,
        in honest-verifier mode (transcript=None), the injected
        challenges 'eq_e' [L, d] and 'prd_e' [L, 1].
    challenges: [L, d] round challenges (honest-verifier mode only).
    transcript: utils.transcript.Transcript — Fiat-Shamir mode: round
        challenges are squeezed after absorbing each round's h
        commitments; sigma challenges after absorbing the first moves.
    open_points / open_points_fn: where CPpoly opens; `open_points_fn`
        receives the [L, d] round challenges (needed in FS mode where
        they are not known upfront). Defaults to the challenges for the
        plain CPsc; CPMat passes the original 2d-variable points.
    open_tables: what CPpoly opens (defaults to the two tables).
    staged: drive the CPpoly openings through the per-shape-jitted
        bucket path (poly.prove_staged) and the round loop through one
        jitted core — call OUTSIDE jit; honest-verifier mode only.
    Returns (proof, z0) with z0 the claimed sum (mont [L, 1]).
    """
    if staged:
        assert transcript is None and challenges is not None, \
            "staged prove is honest-verifier (explicit challenges) only"
        return _prove_staged_hv(key, tables, rand, beta_table,
                                open_points, open_tables, open_points_fn,
                                challenges)
    k_tables = tables.shape[0]
    d = (challenges.shape[-1] if challenges is not None
         else tables.shape[-1].bit_length() - 1)
    full = tables if beta_table is None else jnp.concatenate(
        [beta_table[None], tables], axis=0)

    g, h = key.g1, _blinding(key)

    # --- round loop: commit h_i, then draw r_i ------------------------
    hs, hcs, rs, zs = [], [], [], []
    for i in range(d):
        hpoly = mle.round_poly(full)                # [L, k+1]
        hc = commit_scalar(g, hpoly)                # [L, k+1] points
        if transcript is not None:
            transcript.absorb_point(hc)
            r = transcript.challenge()
        else:
            r = challenges[..., i : i + 1]
        hs.append(hpoly)
        hcs.append(hc)
        rs.append(r)
        zs.append(polytools.eval_at(hpoly, r))
        full = mle.fold(full, r)

    r_stack = jnp.concatenate(rs, axis=-1) if d else \
        jnp.zeros((FR.nlimbs, 0), jnp.uint32)
    finals_tbl = full                               # [k, L, 1]
    z0 = fl.add(FR, polytools.eval_at(hs[0], fl.zero(FR)),
                polytools.eval_at(hs[0], fl.one(FR)))

    # --- per-round ZKEq proofs: h_i(0)+h_i(1) == z_i ------------------
    # (commitments are deterministic => r0 == r1 == 0; one vectorized
    # call proves all d rounds)
    a_eq = sigma._smul(h, rand["eq_k"])             # first moves [L, d]
    if transcript is not None:
        transcript.absorb_point(a_eq)
        eq_e = transcript.challenges(d)
    else:
        eq_e = rand["eq_e"]
    zero_d = FR_OPS.zero((d,))
    eq_pfs = sigma.ZKEqProof(
        a=a_eq,
        z=FR_OPS.add(rand["eq_k"], FR_OPS.mul(eq_e, zero_d)))

    # --- CPpoly openings of the two committed MLEs --------------------
    if open_points_fn is not None:
        open_points = open_points_fn(r_stack)
    if open_points is None:
        open_points = (r_stack, r_stack)
    if open_tables is None:
        open_tables = (tables[0], tables[1])
    ans, ans_c, pfs = [], [], []
    for t, pt in zip(open_tables, open_points):
        a_val, a_com = cppoly.compute_answer(key, t, pt)
        ans.append(a_val)
        ans_c.append(a_com)
        pfs.append(cppoly.prove(key, t, pt))

    # --- final product proof: z_d = (betaEval * a~(r)) * b~(r) --------
    beta_eval = (finals_tbl[0] if beta_table is not None else FR_OPS.one())
    lhs = FR_OPS.mul(beta_eval, ans[0])
    if transcript is not None:
        transcript.absorb_point(point_concat(ans_c))
        # prd first moves depend only on nonces; absorb them before e
        prd_pre = sigma.zkprd_prove(
            g, h, lhs, FR_OPS.zero(), ans[1], FR_OPS.zero(),
            FR_OPS.zero(), rand["prd_b"], FR_OPS.zero())
        transcript.absorb_point(prd_pre.alpha)
        transcript.absorb_point(prd_pre.beta)
        transcript.absorb_point(prd_pre.delta)
        prd_e = transcript.challenge()
    else:
        prd_e = rand["prd_e"]
    prd = sigma.zkprd_prove(
        g, h, lhs, FR_OPS.zero(), ans[1], FR_OPS.zero(), FR_OPS.zero(),
        rand["prd_b"], prd_e)

    from ..curve.group import point_stack
    proof = SumcheckProof(
        r=r_stack, h_comms=point_stack(hcs),
        eq_proofs=eq_pfs,
        ans_comms=point_concat(ans_c),
        poly_pfs=tuple(pfs), prd_proof=prd,
        finals=jnp.concatenate(ans, axis=-1))
    return proof, z0


# ---------------------------------------------------------------------------
# Staged honest-verifier prover: jitted round core + bucketed openings
# ---------------------------------------------------------------------------


@jax.jit
def _hv_core(g: Point, h: Point, full, challenges, eq_k, eq_e):
    """The transcript-free round loop + vectorized ZKEq first moves,
    compiled once per (d, k) shape. Returns everything `prove` derives
    before the CPpoly openings."""
    d = challenges.shape[-1]
    from ..curve.group import point_stack
    hs, hcs = [], []
    cur = full
    for i in range(d):
        hpoly = mle.round_poly(cur)
        hcs.append(commit_scalar(g, hpoly))
        hs.append(hpoly)
        cur = mle.fold(cur, challenges[..., i : i + 1])
    z0 = fl.add(FR, polytools.eval_at(hs[0], fl.zero(FR)),
                polytools.eval_at(hs[0], fl.one(FR)))
    a_eq = sigma._smul(h, eq_k)
    eq_z = FR_OPS.add(eq_k, FR_OPS.mul(eq_e, FR_OPS.zero((d,))))
    return point_stack(hcs), cur, z0, a_eq, eq_z


@jax.jit
def _prd_jit(g, h, beta_eval, ans0, ans1, prd_b, prd_e):
    lhs = FR_OPS.mul(beta_eval, ans0)
    return sigma.zkprd_prove(g, h, lhs, FR_OPS.zero(), ans1,
                             FR_OPS.zero(), FR_OPS.zero(), prd_b, prd_e)


def _prove_staged_hv(key, tables, rand, beta_table, open_points,
                     open_tables, open_points_fn, challenges):
    """Staged `prove` body: same proof object, per-shape-jitted pieces."""
    from ..curve.group import point_stack
    g, h = key.g1, _blinding(key)
    full = tables if beta_table is None else jnp.concatenate(
        [beta_table[None], tables], axis=0)
    h_comms, finals_tbl, z0, a_eq, eq_z = _hv_core(
        g, h, full, challenges, rand["eq_k"], rand["eq_e"])
    eq_pfs = sigma.ZKEqProof(a=a_eq, z=eq_z)
    r_stack = challenges

    if open_points_fn is not None:
        open_points = open_points_fn(r_stack)
    if open_points is None:
        open_points = (r_stack, r_stack)
    if open_tables is None:
        open_tables = (tables[0], tables[1])
    ans, ans_c, pfs = [], [], []
    for t, pt in zip(open_tables, open_points):
        a_val, a_com = cppoly.compute_answer_staged(key, t, pt)
        ans.append(a_val)
        ans_c.append(a_com)
        pfs.append(cppoly.prove_staged(key, t, pt))

    beta_eval = (finals_tbl[0] if beta_table is not None else FR_OPS.one())
    prd = _prd_jit(g, h, beta_eval, ans[0], ans[1],
                   rand["prd_b"], rand["prd_e"])
    proof = SumcheckProof(
        r=r_stack, h_comms=h_comms, eq_proofs=eq_pfs,
        ans_comms=point_concat(ans_c), poly_pfs=tuple(pfs),
        prd_proof=prd, finals=jnp.concatenate(ans, axis=-1))
    return proof, z0


def verify(key: cppoly.PolyKey, z0_comm: Point, mle_comms, proof,
           rand=None, beta_point_fn=None, open_points=None,
           open_points_fn=None, transcript=None, staged=False):
    """Sumcheck verify (`sumcheck.cc:135-179`).

    z0_comm: commitment to the claimed sum. mle_comms: tuple of
    PolyComm for the two committed MLEs. beta_point_fn: callable
    r -> beta(rho, r) closed form (None = matrix mode, beta == 1).
    transcript: Fiat-Shamir mode — challenges are RECOMPUTED from the
    proof's commitments (the proof's r field is ignored), so any
    tampering with the transcript order breaks verification.
    rand: honest-verifier mode challenges {'eq_e', 'prd_e'}.
    staged: per-shape-jitted pieces (call OUTSIDE jit, HV mode only) —
    the two CPpoly ladders verify through ONE compiled program.
    """
    if staged:
        assert transcript is None and rand is not None
        return _verify_staged_hv(key, z0_comm, mle_comms, proof, rand,
                                 beta_point_fn, open_points,
                                 open_points_fn)
    d = proof.r.shape[-1]
    g, h = key.g1, _blinding(key)
    checks = []

    # --- replay rounds ------------------------------------------------
    rs = []
    for i in range(d):
        hc = point_map(lambda x: x[i], proof.h_comms)   # [L, k+1]
        if transcript is not None:
            transcript.absorb_point(hc)
            rs.append(transcript.challenge())
        else:
            rs.append(proof.r[..., i : i + 1])
    r_stack = jnp.concatenate(rs, axis=-1) if d else proof.r
    if transcript is not None:
        transcript.absorb_point(proof.eq_proofs.a)
        eq_e = transcript.challenges(d)
        transcript.absorb_point(proof.ans_comms)
        transcript.absorb_point(proof.prd_proof.alpha)
        transcript.absorb_point(proof.prd_proof.beta)
        transcript.absorb_point(proof.prd_proof.delta)
        prd_e = transcript.challenge()
    else:
        eq_e = rand["eq_e"]
        prd_e = rand["prd_e"]

    z_comm = z0_comm
    for i in range(d):
        hc = point_map(lambda x: x[i], proof.h_comms)
        v0 = polytools.eval_as_poly_on(hc, FR_OPS.zero())
        v1 = polytools.eval_as_poly_on(hc, FR_OPS.one())
        v_comm = G1.add(v0, v1)
        pf_i = sigma.ZKEqProof(
            a=point_map(lambda x: x[..., i : i + 1], proof.eq_proofs.a),
            z=proof.eq_proofs.z[..., i : i + 1])
        checks.append(sigma.zkeq_verify(
            h, v_comm, z_comm, pf_i, eq_e[..., i : i + 1]))
        z_comm = polytools.eval_as_poly_on(hc, rs[i])

    # --- CPpoly checks against the ORIGINAL commitments ---------------
    if open_points_fn is not None:
        open_points = open_points_fn(r_stack)
    if open_points is None:
        open_points = (r_stack, r_stack)
    for idx, (cm, pt) in enumerate(zip(mle_comms, open_points)):
        ansc = point_map(lambda x: x[..., idx : idx + 1], proof.ans_comms)
        checks.append(cppoly.check_commit(key, cm))
        checks.append(cppoly.verify(key, cm, ansc, pt,
                                    proof.poly_pfs[idx]))

    # --- product proof: lhs = betaEval * ansA, rhs = ansB, out = z_d --
    beta_eval = (beta_point_fn(r_stack) if beta_point_fn is not None
                 else FR_OPS.one())
    ans_a = point_map(lambda x: x[..., 0:1], proof.ans_comms)
    ans_b = point_map(lambda x: x[..., 1:2], proof.ans_comms)
    lhs_comm = G1.scalar_mul(ans_a, fl.from_mont(FR, beta_eval))
    checks.append(sigma.zkprd_verify(
        g, h, lhs_comm, ans_b, z_comm, proof.prd_proof, prd_e))

    out = checks[0]
    for c in checks[1:]:
        out = jnp.logical_and(jnp.all(out), jnp.all(c))
    return out


@jax.jit
def _hv_verify_rounds(g, h, z0_comm, h_comms, eq_a, eq_z, r, eq_e):
    """Round replay + ZKEq checks, one compiled program per (d, k).
    Returns ([d] round checks, final z_comm)."""
    d = r.shape[-1]
    checks = []
    z_comm = z0_comm
    for i in range(d):
        hc = point_map(lambda x: x[i], h_comms)
        v0 = polytools.eval_as_poly_on(hc, FR_OPS.zero())
        v1 = polytools.eval_as_poly_on(hc, FR_OPS.one())
        v_comm = G1.add(v0, v1)
        pf_i = sigma.ZKEqProof(a=point_map(lambda x: x[..., i : i + 1], eq_a),
                               z=eq_z[..., i : i + 1])
        checks.append(sigma.zkeq_verify(h, v_comm, z_comm, pf_i,
                                        eq_e[..., i : i + 1]))
        z_comm = polytools.eval_as_poly_on(hc, r[..., i : i + 1])
    return jnp.stack([jnp.all(c) for c in checks]), z_comm


@jax.jit
def _prd_verify_jit(g, h, beta_eval, ans_comms, z_comm, prd, prd_e):
    ans_a = point_map(lambda x: x[..., 0:1], ans_comms)
    ans_b = point_map(lambda x: x[..., 1:2], ans_comms)
    lhs_comm = G1.scalar_mul(ans_a, fl.from_mont(FR, beta_eval))
    return sigma.zkprd_verify(g, h, lhs_comm, ans_b, z_comm, prd, prd_e)


def _verify_staged_hv(key, z0_comm, mle_comms, proof, rand,
                      beta_point_fn, open_points, open_points_fn):
    g, h = key.g1, _blinding(key)
    r_stack = proof.r
    round_ok, z_comm = _hv_verify_rounds(
        g, h, z0_comm, proof.h_comms, proof.eq_proofs.a, proof.eq_proofs.z,
        r_stack, rand["eq_e"])
    checks = [round_ok]

    if open_points_fn is not None:
        open_points = open_points_fn(r_stack)
    if open_points is None:
        open_points = (r_stack, r_stack)
    for idx, (cm, pt) in enumerate(zip(mle_comms, open_points)):
        ansc = point_map(lambda x: x[..., idx : idx + 1], proof.ans_comms)
        checks.append(cppoly.check_commit_staged(key, cm))
        checks.append(cppoly.verify_staged(key, cm, ansc, pt,
                                           proof.poly_pfs[idx]))

    beta_eval = (beta_point_fn(r_stack) if beta_point_fn is not None
                 else FR_OPS.one())
    checks.append(_prd_verify_jit(g, h, beta_eval, proof.ans_comms,
                                  z_comm, proof.prd_proof, rand["prd_e"]))
    out = checks[0]
    for c in checks[1:]:
        out = jnp.logical_and(jnp.all(out), jnp.all(c))
    return out


def _blinding(key: cppoly.PolyKey) -> Point:
    """Blinding base H for scalar commitments. Derived from the SRS:
    use the alpha-shifted generator base (independent of G under DLOG
    given alpha is toxic waste)."""
    return point_map(lambda x: x[..., -1:], key.bases_a[cppoly.poly_d(key)])
