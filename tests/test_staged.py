"""Staged (per-shape-jitted) prover/verifier paths vs the monolithic
ones, the device field matmul, SRS disk caching, and fast sampling.

The staged path is the TPU bench route for the BASELINE configs (CPmmp
1024x1024, CPpoly 20-var): it must produce proofs the monolithic
verifier accepts and vice versa.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import G1
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.gadgets import matrix as cpmat
from legosnark_tpu.gadgets import poly as cppoly
from legosnark_tpu.prototools import mle
from legosnark_tpu.utils import rand as lrand

from oracle import R as R_ORACLE

FR = bn254.FR
R = bn254.R


def test_rand_fast_limbs_valid():
    rng = np.random.default_rng(5)
    limbs = lrand.rand_fr_limbs_fast(rng, 64)
    vals = [fl.limbs_to_int(limbs[:, i]) for i in range(64)]
    assert all(0 <= v < R for v in vals)
    assert len(set(vals)) == 64  # distinct
    # mont roundtrip
    m = lrand.rand_fr_mont_fast(np.random.default_rng(5), 64)
    back = np.asarray(fl.from_mont(FR, m))
    assert all(fl.limbs_to_int(back[:, i]) == vals[i] for i in range(64))


def test_matmul_mont_vs_host():
    n = 8
    rng = np.random.default_rng(9)
    A = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    B = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    Am = jnp.asarray(np.stack([FR.to_mont_ints(r) for r in A]))
    Bm = jnp.asarray(np.stack([FR.to_mont_ints(r) for r in B]))
    Cm = jax.jit(mle.matmul_mont)(Am, Bm)
    got = np.asarray(fl.from_mont(FR, Cm))
    for i in range(n):
        for j in range(n):
            want = sum(A[i][k] * B[k][j] for k in range(n)) % R
            assert fl.limbs_to_int(got[i, :, j]) == want, (i, j)


def test_cppoly_staged_matches_monolithic():
    d = 3
    rng = np.random.default_rng(3)
    key = cppoly.keygen(d, seed=2)
    v = lrand.rand_fr_mont(rng, 1 << d)
    r = lrand.rand_fr_mont(rng, d)

    pf_mono = jax.jit(cppoly.prove)(key, v, r)
    pf_staged = cppoly.prove_staged(key, v, r)
    assert bool(np.all(np.asarray(G1.eq(pf_mono.witness,
                                        pf_staged.witness))))
    assert bool(np.all(np.asarray(G1.eq(pf_mono.witnessa,
                                        pf_staged.witnessa))))

    cm_mono = jax.jit(cppoly.commit)(key, v)
    cm_staged = cppoly.commit_staged(key, v)
    assert bool(np.all(np.asarray(G1.eq(cm_mono.c, cm_staged.c))))
    assert bool(np.all(np.asarray(G1.eq(cm_mono.ca, cm_staged.ca))))


def _mat_fixture(d):
    n = 1 << d
    rng = np.random.default_rng(11)
    key = cpmat.keygen(n, seed=1)
    A = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    B = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    C = [[sum(a * b for a, b in zip(row, col)) % R for col in zip(*B)]
         for row in A]
    Am = jnp.asarray(np.stack([FR.to_mont_ints(r) for r in A]))
    Bm = jnp.asarray(np.stack([FR.to_mont_ints(r) for r in B]))
    Cm = jnp.asarray(np.stack([FR.to_mont_ints(r) for r in C]))
    nonces = cpmat.make_nonces(d, seed=3)
    chal = lrand.rand_fr_mont(rng, d)
    hv = {"eq_e": lrand.rand_fr_mont(rng, d),
          "prd_e": lrand.rand_fr_mont(rng, 1)}
    r = lrand.rand_fr_mont(rng, d)
    s = lrand.rand_fr_mont(rng, d)
    return key, (A, B, C), (Am, Bm, Cm), nonces, chal, hv, r, s


def test_cpmat_staged_prove_consistency():
    """Fast-tier consistency: the staged CPmmp prover's root commitment
    must equal the commitment of the INDEPENDENTLY computed public
    output MLE eval C~(r||s) (C from the host bigint matmul), and the
    sumcheck finals must equal the MLE openings of A, B at the claimed
    points — all without the slow monolithic jit or any pairings."""
    from legosnark_tpu.gadgets import sumcheck as cpsc
    from legosnark_tpu.prototools import mle

    d = 2
    key, _, (Am, Bm, Cm), nonces, chal, hv, r, s = _mat_fixture(d)

    pf = cpmat.prove_output_in_clear_staged(
        key, Am, Bm, r, s, nonces, chal, hv)

    t = jax.jit(cpmat.eval_public_output)(Cm, r, s)
    t_comm = jax.jit(cpsc.commit_scalar)(key.poly_key.g1, t)
    assert bool(np.all(np.asarray(G1.eq(t_comm, pf.t_comm))))

    a_open = mle.eval_mle(cpmat.flatten_matrix(Am),
                          jnp.concatenate([r, chal], axis=-1))
    b_open = mle.eval_mle(cpmat.flatten_matrix(Bm),
                          jnp.concatenate([chal, s], axis=-1))
    want = np.asarray(fl.from_mont(FR, jnp.concatenate(
        [a_open, b_open], axis=-1)))
    got = np.asarray(fl.from_mont(FR, pf.sc_proof.finals))
    assert np.array_equal(want, got)


@pytest.mark.slow
def test_cpmat_staged_verify_roundtrip():
    """Full staged round-trip incl. the pairing ladders, plus the
    staged-vs-monolithic prover equality (slow tier)."""
    d = 2
    key, (A, B, C), (Am, Bm, Cm), nonces, chal, hv, r, s = _mat_fixture(d)

    a_cm = cpmat.commit_matrix_staged(key, Am)
    b_cm = cpmat.commit_matrix_staged(key, Bm)
    pf = cpmat.prove_output_in_clear_staged(
        key, Am, Bm, r, s, nonces, chal, hv)

    # staged prover == monolithic prover, element by element
    pf_mono = jax.jit(
        lambda *a: cpmat.prove_output_in_clear(
            *a, nonces, challenges=chal, hv_rand=hv))(key, Am, Bm, Cm, r, s)
    assert bool(np.all(np.asarray(G1.eq(pf_mono.t_comm, pf.t_comm))))
    sm, ss = pf_mono.sc_proof, pf.sc_proof
    assert bool(np.all(np.asarray(G1.eq(sm.h_comms, ss.h_comms))))
    assert bool(np.all(np.asarray(G1.eq(sm.ans_comms, ss.ans_comms))))
    for pm, ps in zip(sm.poly_pfs, ss.poly_pfs):
        assert bool(np.all(np.asarray(G1.eq(pm.witness, ps.witness))))
    assert np.array_equal(np.asarray(sm.finals), np.asarray(ss.finals))
    ok = cpmat.verify_output_in_clear_staged(key, a_cm, b_cm, Cm, pf, hv)
    assert bool(np.all(np.asarray(ok)))

    # cross-check: staged proof verifies under the monolithic verifier
    ok2 = cpmat.verify_output_in_clear(key, a_cm, b_cm, Cm, pf,
                                       hv_rand=hv)
    assert bool(np.all(np.asarray(ok2)))

    # soundness: tampered public output must fail
    C_bad = [row[:] for row in C]
    C_bad[0][0] = (C_bad[0][0] + 1) % R
    Cbm = jnp.asarray(np.stack([FR.to_mont_ints(r_) for r_ in C_bad]))
    bad = cpmat.verify_output_in_clear_staged(key, a_cm, b_cm, Cbm, pf, hv)
    assert not bool(np.all(np.asarray(bad)))


def test_keygen_cached_roundtrip(tmp_path):
    d = 2
    k1 = cppoly.keygen_cached(d, seed=4, cache_dir=str(tmp_path))
    assert (tmp_path / f"pst13_d{d}_s4.npz").exists()
    k2 = cppoly.keygen_cached(d, seed=4, cache_dir=str(tmp_path))
    for j in range(d + 1):
        assert np.array_equal(np.asarray(k1.bases[j].x),
                              np.asarray(k2.bases[j].x))
        assert np.array_equal(np.asarray(k1.bases_a[j].y),
                              np.asarray(k2.bases_a[j].y))
    assert np.array_equal(np.asarray(k1.g2_s.x), np.asarray(k2.g2_s.x))
    # loaded key proves/verifies
    rng = np.random.default_rng(8)
    v = lrand.rand_fr_mont(rng, 1 << d)
    r = lrand.rand_fr_mont(rng, d)
    pf1 = jax.jit(cppoly.prove)(k1, v, r)
    pf2 = jax.jit(cppoly.prove)(k2, v, r)
    assert bool(np.all(np.asarray(G1.eq(pf1.witness, pf2.witness))))
