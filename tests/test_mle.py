"""MLE engines vs an int oracle.

Covers `MultiVPolyT::evalMLE`, `mkBeta`, `DPMle`/`DPMatrixMle`
(`/root/reference/src/prototools/{polytools.h,mle.h}`).

Layout/conventions under test (see prototools/mle.py): tables are
[L, 2^d] with the evaluation index on the vector axis; variable i sits
at bit d-1-i of the index (big-endian), so folds are contiguous halves.
"""
import numpy as np
import jax
import jax.numpy as jnp

from legosnark_tpu.curve import bn254
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.prototools import mle

R = bn254.R
FR = bn254.FR
rng = np.random.default_rng(3)


def rand_ints(n):
    return [int(rng.integers(0, 1 << 63)) * int(rng.integers(0, 1 << 63))
            % R for _ in range(n)]


def to_mont(ints):
    """ints -> [L, n] Montgomery."""
    return jnp.asarray(FR.to_mont_ints(ints))


def from_mont_batch(arr):
    """[L, n] (or [L, 1]) -> int or list of ints."""
    arr = np.asarray(arr)
    if arr.shape[-1] == 1:
        return FR.from_mont_limbs(arr[..., :, 0])
    return [FR.from_mont_limbs(arr[..., :, i]) for i in range(arr.shape[-1])]


def oracle_eval_mle(v, rs):
    # big-endian: bind variable 0 (the HIGH bit of the index) first
    v = list(v)
    for r in rs:
        half = len(v) // 2
        v = [(v[j] + r * (v[j + half] - v[j])) % R for j in range(half)]
    return v[0]


def test_eval_mle_matches_oracle():
    d = 4
    v = rand_ints(1 << d)
    rs = rand_ints(d)
    out = jax.jit(mle.eval_mle)(to_mont(v), to_mont(rs))
    assert from_mont_batch(out) == oracle_eval_mle(v, rs)


def test_mk_beta_and_closed_form():
    d = 3
    rho = rand_ints(d)
    beta = from_mont_batch(jax.jit(mle.mk_beta)(to_mont(rho)))
    for p in range(1 << d):
        expect = 1
        for i in range(d):
            bit = (p >> (d - 1 - i)) & 1  # variable i at bit d-1-i
            expect = expect * (rho[i] if bit else (1 - rho[i])) % R
        assert int(beta[p]) == expect

    # eval_beta_point(rho, r) == evaluation of the beta MLE at r
    r = rand_ints(d)
    lhs = from_mont_batch(
        jax.jit(mle.eval_beta_point)(to_mont(rho), to_mont(r)))
    rhs = oracle_eval_mle([int(b) for b in beta], r)
    assert lhs == rhs


def test_matrix_mle_fold():
    # v[c] = sum_r A[r, c] * eq(r, rho)
    n, d = 4, 2
    A = [rand_ints(n) for _ in range(n)]
    rho = rand_ints(d)
    A_mont = jnp.asarray(np.stack([FR.to_mont_ints(row) for row in A]))
    beta = mle.mk_beta(to_mont(rho))
    out = from_mont_batch(jax.jit(mle.matrix_mle_fold)(A_mont, beta))
    beta_int = from_mont_batch(beta)
    for c in range(n):
        expect = sum(A[r][c] * beta_int[r] for r in range(n)) % R
        assert out[c] == expect


def test_prove_rounds_completeness():
    # z0 == true sum; h_i(0)+h_i(1) == z_i; z_d == prod of finals
    d, k = 3, 3
    tabs = [rand_ints(1 << d) for _ in range(k)]
    chal = rand_ints(d)
    tables = jnp.stack([to_mont(t) for t in tabs])
    out = jax.jit(mle.prove_rounds)(tables, to_mont(chal))

    true_sum = sum(tabs[0][p] * tabs[1][p] * tabs[2][p]
                   for p in range(1 << d)) % R
    zs = from_mont_batch(out.zs)
    assert zs[0] == true_sum

    hs = np.asarray(out.h_coeffs)  # [d, L, k+1]
    for i in range(d):
        coeffs = [FR.from_mont_limbs(hs[i, :, j]) for j in range(k + 1)]
        h0 = coeffs[0]
        h1 = sum(coeffs) % R
        assert (h0 + h1) % R == zs[i]
        # z_{i+1} = h_i(r_i)
        acc = 0
        for j in range(k, -1, -1):
            acc = (acc * chal[i] + coeffs[j]) % R
        assert acc == zs[i + 1]

    finals = np.asarray(out.finals)  # [k, L, 1]
    f_ints = [FR.from_mont_limbs(finals[t, :, 0]) for t in range(k)]
    assert f_ints[0] * f_ints[1] * f_ints[2] % R == zs[d]
