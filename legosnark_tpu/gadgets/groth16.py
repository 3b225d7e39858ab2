"""Groth16 zkSNARK over the framework's MSM/NTT/pairing kernels.

The comparison baseline of the reference's `legogrothmatrix` example
(`/root/reference/src/examples/legogrothmatrix.cc:128-190`), which runs
libsnark's `r1cs_gg_ppzksnark` generator/prover/verifier on an R1CS.
Here it is a from-scratch Groth16 (eprint 2016/260) on the TPU stack:

  setup(r1cs): trapdoor (tau, alpha, beta, gamma, delta); QAP values
      u_i(tau), v_i(tau), w_i(tau) from Lagrange evaluations at tau
      (prototools.ntt.all_lagrange_at — the same domain machinery as
      CPhadL); all key elements by ONE fixed-base batch exponentiation.
  prove(pk, z): 4 MSMs (A-, B1-, B2-, L-query) + the H polynomial by
      the iNTT -> cosetNTT -> divide-by-Z -> icosetNTT pipeline
      (`lipmaa.cc:136-176` shape) + the H-query MSM.
  verify(vk, x, pf): e(A, B) == e(alphaG1, betaG2) * e(IC(x), gammaG2)
      * e(C, deltaG2) — one product of 4 pairings.

R1CS representation is host-side sparse rows (the circuit builder runs
once per shape); witness evaluation Az/Bz/Cz happens in Python ints
(exact, cheap at driver sizes) while every group/NTT operation runs on
device. Layout: Fr vectors [L, n] (see fields/limb.py).
"""
from __future__ import annotations

from typing import NamedTuple, Any, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import (
    Point, G1, G2, g1_generator, g2_generator, point_map,
)
from ..curve import msm as msm_mod
from ..prototools import ntt
from ..utils import rand as lrand

FR = bn254.FR
R = bn254.R


class R1CS(NamedTuple):
    """Constraints <A_j, z> * <B_j, z> = <C_j, z>; sparse host rows.

    num_vars includes the leading constant-1 variable; variables
    [0, num_public] are public (index 0 is the constant)."""

    num_vars: int
    num_public: int
    A: List[List[Tuple[int, int]]]   # per constraint: [(var, coeff)]
    B: List[List[Tuple[int, int]]]
    C: List[List[Tuple[int, int]]]


class ProvingKey(NamedTuple):
    alpha_g1: Point
    beta_g1: Point
    beta_g2: Point
    delta_g1: Point
    delta_g2: Point
    a_query: Point      # [L, n_vars] g1^{u_i(tau)}
    b1_query: Point     # [L, n_vars] g1^{v_i(tau)}
    b2_query: Point     # g2^{v_i(tau)}
    h_query: Point      # [L, D-1] g1^{tau^i Z(tau)/delta}
    l_query: Point      # [L, n_priv] g1^{(beta u_i + alpha v_i + w_i)/delta}
    domain: int


class VerifyKey(NamedTuple):
    alpha_g1: Point
    beta_g2: Point
    gamma_g2: Point
    delta_g2: Point
    ic: Point           # [L, num_public+1] g1^{(beta u_i+alpha v_i+w_i)/gamma}


class Proof(NamedTuple):
    a: Point   # G1
    b: Point   # G2
    c: Point   # G1


def proof_size_group_elements() -> dict:
    return {"g1": 2, "g2": 1, "fr": 0}


def _domain(m: int) -> int:
    d = 1
    while d < m:
        d *= 2
    return d


def setup(r1cs: R1CS, seed: int = 0) -> tuple[ProvingKey, VerifyKey]:
    """`r1cs_gg_ppzksnark_generator` equivalent; trapdoor is toxic
    waste. QAP evaluation at tau is exact host int math (keygen runs
    once); the group elements come from one batched fixed-base exp."""
    rng = np.random.default_rng(seed ^ 0x6706)
    tau, alpha, beta, gamma, delta = (lrand.rand_fr_int(rng)
                                      for _ in range(5))
    m = len(r1cs.A)
    D = _domain(m)
    nv = r1cs.num_vars

    # Lagrange values L_j(tau) over the radix-2 domain (host ints)
    log_d = D.bit_length() - 1
    root = bn254.fr_two_adic_root(log_d)
    z_tau = (pow(tau, D, R) - 1) % R
    d_inv = pow(D, R - 2, R)
    lag = []
    w = 1
    for j in range(D):
        lag.append(z_tau * w % R * d_inv % R
                   * pow((tau - w) % R, R - 2, R) % R)
        w = w * root % R

    # QAP: u_i(tau) = sum_j A[j][i] L_j(tau)
    u = [0] * nv
    v = [0] * nv
    wv = [0] * nv
    for j in range(m):
        for var, coef in r1cs.A[j]:
            u[var] = (u[var] + coef * lag[j]) % R
        for var, coef in r1cs.B[j]:
            v[var] = (v[var] + coef * lag[j]) % R
        for var, coef in r1cs.C[j]:
            wv[var] = (wv[var] + coef * lag[j]) % R

    ginv = pow(gamma, R - 2, R)
    dinv = pow(delta, R - 2, R)
    npub = r1cs.num_public + 1
    ic = [(beta * u[i] + alpha * v[i] + wv[i]) % R * ginv % R
          for i in range(npub)]
    lq = [(beta * u[i] + alpha * v[i] + wv[i]) % R * dinv % R
          for i in range(npub, nv)]
    zd = z_tau * dinv % R
    hq = [pow(tau, i, R) * zd % R for i in range(D - 1)]

    # one fixed-base batch exp per group
    g1_scalars = ([alpha, beta, delta] + u + v + hq + lq + ic)
    t1 = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    g1_pts = msm_mod.batch_scalar_mul(
        G1, t1, jnp.asarray(fl.ints_to_limbs(g1_scalars, FR.nlimbs)), c=8)
    t2 = msm_mod.fixed_base_table(G2, g2_generator(), c=8)
    g2_pts = msm_mod.batch_scalar_mul(
        G2, t2, jnp.asarray(fl.ints_to_limbs(
            [beta, gamma, delta] + v, FR.nlimbs)), c=8)

    def s1(a, b):
        return point_map(lambda x: x[..., a:b], g1_pts)

    def s2(a, b):
        return point_map(lambda x: x[..., a:b], g2_pts)

    o = 3
    pk = ProvingKey(
        alpha_g1=s1(0, 1), beta_g1=s1(1, 2), beta_g2=s2(0, 1),
        delta_g1=s1(2, 3), delta_g2=s2(2, 3),
        a_query=s1(o, o + nv),
        b1_query=s1(o + nv, o + 2 * nv),
        b2_query=s2(3, 3 + nv),
        h_query=s1(o + 2 * nv, o + 2 * nv + D - 1),
        l_query=s1(o + 2 * nv + D - 1, o + 2 * nv + D - 1 + nv - npub),
        domain=D)
    vk = VerifyKey(
        alpha_g1=s1(0, 1), beta_g2=s2(0, 1), gamma_g2=s2(1, 2),
        delta_g2=s2(2, 3),
        ic=s1(o + 2 * nv + D - 1 + nv - npub,
              o + 2 * nv + D - 1 + nv - npub + npub))
    return pk, vk


def _sparse_matvec(rows, z):
    return [sum(coef * z[var] for var, coef in row) % R for row in rows]


def prove(pk: ProvingKey, r1cs: R1CS, z: List[int], seed: int = 1) -> Proof:
    """`r1cs_gg_ppzksnark_prover` equivalent: 5 MSMs + the NTT quotient
    pipeline; r, s blinding per Groth16."""
    rng = np.random.default_rng(seed ^ 0x6707)
    r_bl = lrand.rand_fr_int(rng)
    s_bl = lrand.rand_fr_int(rng)
    D = pk.domain
    nv = r1cs.num_vars
    npub = r1cs.num_public + 1

    az = _sparse_matvec(r1cs.A, z) + [0] * (D - len(r1cs.A))
    bz = _sparse_matvec(r1cs.B, z) + [0] * (D - len(r1cs.B))
    cz = _sparse_matvec(r1cs.C, z) + [0] * (D - len(r1cs.C))

    # H coefficients on device: (u*v - w)/Z via the coset pipeline
    to_m = lambda xs: jnp.asarray(FR.to_mont_ints(xs))
    a_c = ntt.intt(to_m(az))
    b_c = ntt.intt(to_m(bz))
    c_c = ntt.intt(to_m(cz))
    prod = fl.sub(FR, fl.mont_mul(FR, ntt.coset_ntt(a_c),
                                  ntt.coset_ntt(b_c)),
                  ntt.coset_ntt(c_c))
    h = ntt.coset_intt(ntt.divide_by_z_on_coset(prod))[..., : D - 1]

    z_can = jnp.asarray(fl.ints_to_limbs([x % R for x in z], FR.nlimbs))
    a_msm = msm_mod.msm(G1, pk.a_query, z_can)
    b1_msm = msm_mod.msm(G1, pk.b1_query, z_can)
    b2_msm = msm_mod.msm(G2, pk.b2_query, z_can)
    h_msm = msm_mod.msm(G1, pk.h_query, fl.from_mont(FR, h))
    priv = z_can[..., npub:]
    l_msm = msm_mod.msm(G1, pk.l_query, priv)

    enc = lambda k: jnp.asarray(fl.int_to_limbs(k, FR.nlimbs)[:, None])
    A = G1.add(G1.add(pk.alpha_g1, a_msm),
               G1.scalar_mul(pk.delta_g1, enc(r_bl)))
    B = G2.add(G2.add(pk.beta_g2, b2_msm),
               G2.scalar_mul(pk.delta_g2, enc(s_bl)))
    B1 = G1.add(G1.add(pk.beta_g1, b1_msm),
                G1.scalar_mul(pk.delta_g1, enc(s_bl)))
    C = G1.add(
        G1.add(l_msm, h_msm),
        G1.add(G1.scalar_mul(A, enc(s_bl)),
               G1.add(G1.scalar_mul(B1, enc(r_bl)),
                      G1.neg(G1.scalar_mul(
                          pk.delta_g1,
                          enc(r_bl * s_bl % R))))))
    return Proof(a=A, b=B, c=C)


def verify(vk: VerifyKey, public: List[int], pf: Proof):
    """`r1cs_gg_ppzksnark_online_verifier` equivalent:
    e(A, B) * e(-alpha, beta) * e(-IC(x), gamma) * e(-C, delta) == 1."""
    from ..curve import pairing as pr
    x = [1] + [v % R for v in public]
    ic = msm_mod.msm(G1, vk.ic,
                     jnp.asarray(fl.ints_to_limbs(x, FR.nlimbs)), c=4)
    g1s = pr.point_concat([pf.a, G1.neg(vk.alpha_g1), G1.neg(ic),
                           G1.neg(pf.c)])
    g2s = pr.point_concat([pf.b, vk.beta_g2, vk.gamma_g2, vk.delta_g2])
    return pr.pairing_product_is_one(g1s, g2s)


# ---------------------------------------------------------------------------
# Matmul R1CS builder (`legogrothmatrix.cc:64-124`)
# ---------------------------------------------------------------------------


def matmul_r1cs(n: int):
    """R1CS for C = A*B over n x n matrices via inner-product chains:
    one multiplication constraint per (i, j, k) with running
    accumulators, the shape of libsnark's `inner_product_gadget`
    ladder (`legogrothmatrix.cc:72-117`). Public inputs: the n^2
    entries of C. Returns (r1cs, assign) where assign(A, B) builds the
    full variable vector from int matrices."""
    n2 = n * n
    # variables: [1, C entries (public), A entries, B entries, partials]
    num_public = n2
    idx_c = lambda i, j: 1 + i * n + j
    idx_a = lambda i, k: 1 + n2 + i * n + k
    idx_b = lambda k, j: 1 + 2 * n2 + k * n + j
    # partial sums s_{i,j,k} for k < n-1 (s_{i,j,n-1} == C[i,j])
    base_p = 1 + 3 * n2
    idx_p = lambda i, j, k: base_p + (i * n + j) * (n - 1) + k

    A_rows, B_rows, C_rows = [], [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                arow = [(idx_a(i, k), 1)]
                brow = [(idx_b(k, j), 1)]
                if k == 0:
                    crow = [(idx_p(i, j, 0) if n > 1 else idx_c(i, j), 1)]
                else:
                    prev = idx_p(i, j, k - 1)
                    cur = (idx_c(i, j) if k == n - 1
                           else idx_p(i, j, k))
                    crow = [(cur, 1), (prev, -1 % R)]
                A_rows.append(arow)
                B_rows.append(brow)
                C_rows.append(crow)

    num_vars = base_p + n2 * (n - 1)
    r1cs = R1CS(num_vars=num_vars, num_public=num_public,
                A=A_rows, B=B_rows, C=C_rows)

    def assign(Amat, Bmat):
        z = [0] * num_vars
        z[0] = 1
        Cmat = [[0] * n for _ in range(n)]
        for i in range(n):
            for k in range(n):
                z[idx_a(i, k)] = Amat[i][k] % R
        for k in range(n):
            for j in range(n):
                z[idx_b(k, j)] = Bmat[k][j] % R
        for i in range(n):
            for j in range(n):
                acc = 0
                for k in range(n):
                    acc = (acc + Amat[i][k] * Bmat[k][j]) % R
                    if k == n - 1:
                        Cmat[i][j] = acc
                        z[idx_c(i, j)] = acc
                    else:
                        z[idx_p(i, j, k)] = acc
        return z, Cmat

    return r1cs, assign
