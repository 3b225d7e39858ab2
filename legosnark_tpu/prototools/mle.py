"""Multilinear-extension engines: evaluation, eq-tables, sumcheck rounds.

TPU-native re-design of the reference's MLE layer:
  * `MultiVPolyT::evalMLE` (`/root/reference/src/prototools/polytools.h:207-234`)
  * `mkBeta`/`compute_eq_tbl` (`polytools.h:165-204`, `mle.h:93-105`)
  * the DP state machines `DPBeta`/`DPMle`/`DPMatrixMle`
    (`/root/reference/src/prototools/mle.h:15-262`)

Instead of three mutable table-halving classes, everything reduces to
ONE primitive: `fold(table, r)` — the multilinear partial evaluation
v'[p] = v[p|x0=0]*(1-r) + v[p|x0=1]*r. The eq-polynomial beta(x, rho)
is itself multilinear, so the sumcheck prover is a single generic scan
over k stacked tables (beta is just one more table), replacing
DPBeta's prefix/suffix bookkeeping with the same fold. `DPMatrixMle`'s
2d->d variable collapse becomes one matmul-shaped contraction
(`matrix_mle_fold`).

Conventions (fixed across the whole framework): index p of a 2^d table
has variable i at bit i (little-endian); sumcheck round i binds
variable i; tables are Montgomery-form Fr limbs [2^d, L].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254

FR = bn254.FR


def fold(v, r):
    """Bind the lowest variable to r: [2n, L] -> [n, L].

    v'[p] = v[2p] + r*(v[2p+1] - v[2p])  (one mul per output entry —
    the same trick as `DPMle::pushRandomness`, `mle.h:199-210`).
    """
    lo = v[0::2]
    hi = v[1::2]
    return fl.add(FR, lo, fl.mont_mul(FR, r, fl.sub(FR, hi, lo)))


def eval_mle(v, rs):
    """Full MLE evaluation v~(r_0..r_{d-1}) — `polytools.h:207-234`.

    v: [2^d, L]; rs: [d, L] Montgomery. O(2^d) muls via d folds. The
    fold is a `lax.scan`-free Python loop over the *static* dimension d
    (each iteration halves the shape, so shapes stay static per step).
    """
    d = rs.shape[0]
    assert v.shape[0] == 1 << d
    for i in range(d):
        v = fold(v, rs[i])
    return v[0]


def mk_beta(rho):
    """eq-polynomial table: out[p] = prod_i (p_i ? rho_i : 1-rho_i).

    Replaces `mkBetas`/`compute_eq_tbl` (`polytools.h:165-204`,
    `mle.h:93-105`). Built high-variable-first so bit i of p is
    variable i. O(2^d) muls total.
    """
    d = rho.shape[0]
    one = fl.one(FR)
    t = one[None]  # [1, L]
    for k in range(d - 1, -1, -1):
        r = rho[k]
        t0 = fl.mont_mul(FR, t, fl.sub(FR, one, r)[None])
        t1 = fl.mont_mul(FR, t, r[None])
        t = jnp.stack([t0, t1], axis=1).reshape(-1, t.shape[-1])
    return t


def eval_beta_point(rho, r):
    """beta(rho, r) = prod_i (rho_i r_i + (1-rho_i)(1-r_i)) — the
    closed-form the verifier uses (`mle.h:32-39`). O(d) muls."""
    one = fl.one(FR)
    terms = fl.add(
        FR,
        fl.mont_mul(FR, rho, r),
        fl.mont_mul(FR, fl.sub(FR, one[None], rho),
                    fl.sub(FR, one[None], r)))
    acc = one
    for i in range(terms.shape[0]):
        acc = fl.mont_mul(FR, acc, terms[i])
    return acc


def matrix_mle_fold(A, beta_rho):
    """`DPMatrixMle` preprocessing (`mle.h:237-262`): collapse the row
    variables of an n x n matrix MLE with the eq-table of rho:
    v[c] = sum_r A[r, c] * eq(r, rho). A: [n, n, L] (row, col) in
    Montgomery form; beta_rho: [n, L] = mk_beta(rho). Output [n, L].

    Row index bits are the HIGH variables of the flattened 2d-variable
    MLE (index = col + n*row), matching `A[l||r]` in the reference.
    """
    prod = fl.mont_mul(FR, A, beta_rho[:, None, :])
    return field_sum(prod)


def field_sum(v):
    """Sum of field elements along axis 0 ([n, ..., L] -> [..., L]) via
    log-depth pairwise tree reduction (each level is one fully
    vectorized modular add)."""
    n = v.shape[0]
    while n > 1:
        half = n // 2
        s = fl.add(FR, v[0 : 2 * half : 2], v[1 : 2 * half : 2])
        if n % 2:
            s = jnp.concatenate([s, v[-1:]], axis=0)
        v = s
        n = (n + 1) // 2
    return v[0]


# ---------------------------------------------------------------------------
# Generic product-sumcheck prover rounds
# ---------------------------------------------------------------------------


class SumcheckRounds(NamedTuple):
    h_coeffs: jnp.ndarray   # [d, k+1, L] round polynomials (coeff form)
    finals: jnp.ndarray     # [k, L] each table folded to a point
    zs: jnp.ndarray         # [d+1, L] claimed partial sums z_0..z_d


def round_poly(tables):
    """One sumcheck round polynomial for a product of k tables.

    h(X) = sum_p prod_t ( T_t[2p] + X*(T_t[2p+1]-T_t[2p]) ) — degree k.
    tables: [k, 2n, L]. Returns coeffs [k+1, L]. Mirrors
    `make_new_h_poly` (`/root/reference/src/gadgets/sumcheck.h:85-106`)
    but with the per-p product vectorized across the whole table.
    """
    k = tables.shape[0]
    lo = tables[:, 0::2]                     # [k, n, L]
    slope = fl.sub(FR, tables[:, 1::2], lo)  # [k, n, L]

    # per-p polynomial product, coefficients ascending in X
    coeffs = jnp.stack([lo[0], slope[0]])    # [2, n, L]
    for t in range(1, k):
        c_lo = fl.mont_mul(FR, coeffs, lo[t][None])
        c_sl = fl.mont_mul(FR, coeffs, slope[t][None])
        zerorow = fl.zero(FR, (1,) + coeffs.shape[1:-1])
        coeffs = fl.add(
            FR,
            jnp.concatenate([c_lo, zerorow], axis=0),
            jnp.concatenate([zerorow, c_sl], axis=0))
    # sum over p
    return field_sum(jnp.swapaxes(coeffs, 0, 1))


def poly_eval(coeffs, x):
    """Horner evaluation of [k+1, L] coefficients at Montgomery x."""
    acc = coeffs[-1]
    for i in range(coeffs.shape[0] - 2, -1, -1):
        acc = fl.add(FR, fl.mont_mul(FR, acc, x), coeffs[i])
    return acc


def prove_rounds(tables, challenges) -> SumcheckRounds:
    """Run all d sumcheck rounds for sum_p prod_t T_t[p].

    tables: [k, 2^d, L] Montgomery; challenges: [d, L] Montgomery
    (injected — honest-verifier mode like the reference's
    prover-sampled challenges at `sumcheck.cc:46-48` — or derived from
    a Fiat-Shamir transcript by the caller).

    Python loop over the static d (shapes halve per round; a lax.scan
    cannot change shapes across iterations).
    """
    d = challenges.shape[0]
    k = tables.shape[0]
    assert tables.shape[1] == 1 << d

    hs, zs = [], []
    # z_0 = h_0(0) + h_0(1) is established by the first round poly
    for i in range(d):
        h = round_poly(tables)              # [k+1, L]
        hs.append(h)
        r = challenges[i]
        zs.append(poly_eval(h, r))          # z_{i+1} = h_i(r_i)
        tables = jax.vmap(lambda t: fold(t, r))(tables)

    finals = tables[:, 0]                   # [k, L]
    z0 = fl.add(FR, poly_eval(hs[0], fl.zero(FR)),
                poly_eval(hs[0], fl.one(FR)))
    return SumcheckRounds(
        h_coeffs=jnp.stack(hs), finals=finals,
        zs=jnp.concatenate([z0[None], jnp.stack(zs)]))
