"""Multilinear-extension engines: evaluation, eq-tables, sumcheck rounds.

TPU-native re-design of the reference's MLE layer:
  * `MultiVPolyT::evalMLE` (`/root/reference/src/prototools/polytools.h:207-234`)
  * `mkBeta`/`compute_eq_tbl` (`polytools.h:165-204`, `mle.h:93-105`)
  * the DP state machines `DPBeta`/`DPMle`/`DPMatrixMle`
    (`/root/reference/src/prototools/mle.h:15-262`)

Instead of three mutable table-halving classes, everything reduces to
ONE primitive: `fold(table, r)` — the multilinear partial evaluation
v'[p] = v[p|x0=0]*(1-r) + v[p|x0=1]*r. The eq-polynomial beta(x, rho)
is itself multilinear, so the sumcheck prover is a single generic loop
over k stacked tables (beta is just one more table), replacing
DPBeta's prefix/suffix bookkeeping with the same fold. `DPMatrixMle`'s
2d->d variable collapse becomes one contraction (`matrix_mle_fold`).

Conventions (fixed across the whole framework): a 2^d evaluation table
lives on the VECTOR (minor) axis as [..., L, 2^d]; index p has variable
i at bit d-1-i (BIG-endian: variable 0 is the most significant bit), so
binding variable 0 splits the table into two contiguous halves — an
aligned lane slice on TPU, where the little-endian convention of the
reference (`mle.h:199-210`) would be a strided gather. Sumcheck round i
binds variable i. Tables are Montgomery-form Fr limbs; challenge lists
are [L, d].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254

FR = bn254.FR


def fold(v, r):
    """Bind the top variable to r: [..., L, 2n] -> [..., L, n].

    v' = lo + r*(hi - lo) over the contiguous halves (one mul per
    output entry — the same trick as `DPMle::pushRandomness`,
    `mle.h:199-210`, re-laid-out for contiguous lane slices).
    r: [L, 1] Montgomery.
    """
    n = v.shape[-1] // 2
    lo = v[..., :n]
    hi = v[..., n:]
    return fl.add(FR, lo, fl.mont_mul(FR, r, fl.sub(FR, hi, lo)))


def eval_mle(v, rs):
    """Full MLE evaluation v~(r_0..r_{d-1}) — `polytools.h:207-234`.

    v: [..., L, 2^d]; rs: [L, d] Montgomery. O(2^d) muls via d folds.
    The fold is a Python loop over the *static* dimension d (each
    iteration halves the shape, so shapes stay static per step).
    Returns [..., L, 1].
    """
    d = rs.shape[-1]
    assert v.shape[-1] == 1 << d
    for i in range(d):
        v = fold(v, rs[..., i : i + 1])
    return v


def mk_beta(rho):
    """eq-polynomial table [L, 2^d]: out[p] = prod_i (p_i ? rho_i : 1-rho_i).

    Replaces `mkBetas`/`compute_eq_tbl` (`polytools.h:165-204`,
    `mle.h:93-105`). Built innermost-variable-first so variable i lands
    at bit d-1-i of p (big-endian convention). O(2^d) muls total, all
    concats contiguous.
    """
    d = rho.shape[-1]
    one = fl.one(FR)
    t = one  # [L, 1]
    for k in range(d - 1, -1, -1):
        r = rho[..., k : k + 1]
        t0 = fl.mont_mul(FR, t, fl.sub(FR, one, r))
        t1 = fl.mont_mul(FR, t, r)
        t = jnp.concatenate([t0, t1], axis=-1)
    return t


def eval_beta_point(rho, r):
    """beta(rho, r) = prod_i (rho_i r_i + (1-rho_i)(1-r_i)) — the
    closed-form the verifier uses (`mle.h:32-39`). rho, r: [L, d].
    O(d) muls. Returns [L, 1]."""
    one = fl.one(FR)
    terms = fl.add(
        FR,
        fl.mont_mul(FR, rho, r),
        fl.mont_mul(FR, fl.sub(FR, one, rho), fl.sub(FR, one, r)))
    return field_prod(terms)


def matrix_mle_fold(A, beta_rho):
    """`DPMatrixMle` preprocessing (`mle.h:237-262`): collapse the row
    variables of an n x n matrix MLE with the eq-table of rho:
    v[c] = sum_r A[r, c] * eq(r, rho).

    A: [n, L, n] (rows leading, cols on the vector axis) in Montgomery
    form; beta_rho: [L, n] = mk_beta(rho). Output [L, n].

    Row index bits are the HIGH variables of the flattened 2d-variable
    MLE (index = col + n*row), matching `A[l||r]` in the reference.
    """
    b = jnp.moveaxis(beta_rho, -1, 0)[..., None]   # [n, L, 1]
    prod = fl.mont_mul(FR, A, b)
    return field_sum_leading(prod)


def field_sum_leading(v):
    """Sum of field elements along axis 0 ([n, ..., L, V] -> [..., L, V])
    via log-depth pairwise tree reduction."""
    n = v.shape[0]
    while n > 1:
        half = n // 2
        s = fl.add(FR, v[0 : 2 * half : 2], v[1 : 2 * half : 2])
        if n % 2:
            s = jnp.concatenate([s, v[-1:]], axis=0)
        v = s
        n = (n + 1) // 2
    return v[0]


def field_sum(v):
    """Sum along the VECTOR (last) axis: [..., L, n] -> [..., L, 1] via
    contiguous-halving tree reduction (aligned lane slices)."""
    n = v.shape[-1]
    while n > 1:
        h = n // 2
        s = fl.add(FR, v[..., :h], v[..., h : 2 * h])
        if n % 2:
            s = jnp.concatenate([s, v[..., -1:]], axis=-1)
        v = s
        n = (n + 1) // 2
    return v


def field_prod(v):
    """Product along the vector axis: [..., L, n] -> [..., L, 1]."""
    n = v.shape[-1]
    while n > 1:
        h = n // 2
        s = fl.mont_mul(FR, v[..., :h], v[..., h : 2 * h])
        if n % 2:
            s = jnp.concatenate([s, v[..., -1:]], axis=-1)
        v = s
        n = (n + 1) // 2
    return v


def matmul_mont(A, B, chunk: int = 4):
    """Field matrix product C = A*B over Fr, C[i,:,j] = sum_k A[i,:,k]*B[k,:,j].

    A, B: [n, L, n] Montgomery (rows leading, cols on the vector axis).
    Device-side replacement for the reference's host O(n^3) build loop
    (`/root/reference/src/examples/matrixsc.cc:82-91`) — at n=1024 the
    host bigint loop is 2^30 Python multiplies (hours); this is ~2^30
    field muls of batched limb arithmetic (~seconds on TPU). Blocked
    over k with a lax.scan so the [chunk, n, L, n] product intermediate
    stays bounded.
    """
    n = A.shape[0]
    if n <= chunk:
        a = jnp.moveaxis(A, -1, 0)[..., None]      # [n(k), n(i), L, 1]
        prod = fl.mont_mul(FR, a, B[:, None])      # [n, n, L, n]
        return field_sum_leading(prod)
    assert n % chunk == 0
    nb = n // chunk
    # [nb, chunk(k), n(i), L, 1] blocks of A columns
    Ax = jnp.moveaxis(A.reshape(n, A.shape[1], nb, chunk), 2, 0)
    Ax = jnp.moveaxis(Ax, -1, 1)[..., None]
    Bx = B.reshape(nb, chunk, B.shape[1], n)       # [nb, chunk(k), L, n]

    def body(acc, blk):
        a_blk, b_blk = blk
        prod = fl.mont_mul(FR, a_blk, b_blk[:, None])  # [chunk, n, L, n]
        return fl.add(FR, acc, field_sum_leading(prod)), None

    acc0 = fl.zero(FR, (n, n))                     # [n, L, n]
    out, _ = jax.lax.scan(body, acc0, (Ax, Bx))
    return out


# ---------------------------------------------------------------------------
# Generic product-sumcheck prover rounds
# ---------------------------------------------------------------------------


class SumcheckRounds(NamedTuple):
    h_coeffs: jnp.ndarray   # [d, L, k+1] round polynomials (coeff form)
    finals: jnp.ndarray     # [k, L, 1] each table folded to a point
    zs: jnp.ndarray         # [L, d+1] claimed partial sums z_0..z_d


def round_poly(tables):
    """One sumcheck round polynomial for a product of k tables.

    h(X) = sum_p prod_t ( lo_t[p] + X*(hi_t[p]-lo_t[p]) ) — degree k.
    tables: [k, L, 2n]. Returns coeffs [L, k+1] ascending. Mirrors
    `make_new_h_poly` (`/root/reference/src/gadgets/sumcheck.h:85-106`)
    but with the per-p product vectorized across the whole table.
    """
    k = tables.shape[0]
    n = tables.shape[-1] // 2
    lo = tables[..., :n]                      # [k, L, n]
    slope = fl.sub(FR, tables[..., n:], lo)   # [k, L, n]

    # per-p polynomial product, coefficients ascending in X
    coeffs = jnp.stack([lo[0], slope[0]])     # [2, L, n]
    for t in range(1, k):
        c_lo = fl.mont_mul(FR, coeffs, lo[t][None])
        c_sl = fl.mont_mul(FR, coeffs, slope[t][None])
        zerorow = fl.zero(FR, (1, coeffs.shape[-1]))  # [1, L, n]
        c_lo_pad = jnp.concatenate([c_lo, zerorow], axis=0)
        c_sl_pad = jnp.concatenate([zerorow, c_sl], axis=0)
        coeffs = fl.add(FR, c_lo_pad, c_sl_pad)
    # sum over p (vector axis), then lay coefficients on the vector axis
    summed = field_sum(coeffs)                # [k+1, L, 1]
    return jnp.moveaxis(summed[..., 0], 0, -1)  # [L, k+1]


def poly_eval(coeffs, x):
    """Horner evaluation of [..., L, m] coefficients (ascending) at
    Montgomery x [L, 1]. Returns [..., L, 1]."""
    m = coeffs.shape[-1]
    acc = coeffs[..., m - 1 : m]
    for i in range(m - 2, -1, -1):
        acc = fl.add(FR, fl.mont_mul(FR, acc, x), coeffs[..., i : i + 1])
    return acc


def prove_rounds(tables, challenges) -> SumcheckRounds:
    """Run all d sumcheck rounds for sum_p prod_t T_t[p].

    tables: [k, L, 2^d] Montgomery; challenges: [L, d] Montgomery
    (injected — honest-verifier mode like the reference's
    prover-sampled challenges at `sumcheck.cc:46-48` — or derived from
    a Fiat-Shamir transcript by the caller).

    Python loop over the static d (shapes halve per round; a lax.scan
    cannot change shapes across iterations).
    """
    d = challenges.shape[-1]
    assert tables.shape[-1] == 1 << d

    hs, zs = [], []
    # z_0 = h_0(0) + h_0(1) is established by the first round poly
    for i in range(d):
        h = round_poly(tables)              # [L, k+1]
        hs.append(h)
        r = challenges[..., i : i + 1]
        zs.append(poly_eval(h, r))          # z_{i+1} = h_i(r_i)
        tables = fold(tables, r)

    finals = tables                          # [k, L, 1]
    z0 = fl.add(FR, poly_eval(hs[0], fl.zero(FR)),
                poly_eval(hs[0], fl.one(FR)))
    return SumcheckRounds(
        h_coeffs=jnp.stack(hs),
        finals=finals,
        zs=jnp.concatenate([z0] + zs, axis=-1))
