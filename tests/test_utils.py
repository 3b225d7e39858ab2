"""Utility-layer tests: sparse MSM, serialization, BP parser, snark
input format — the round-2 orphans, now wired and tested
(`/root/reference/src/utils/{sparsemexp,matrix,util,bp_circuits}.*`,
`/root/reference/src/gadgets/snark.h:65-82`).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import (
    G1, Point, g1_generator, g1_from_oracle, g1_to_oracle,
)
from legosnark_tpu.curve import msm as msm_mod
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.utils import sparse, util as lutil, rand as lrand
from legosnark_tpu.utils.benchmark import Benchmarkable

R = bn254.R
FR = bn254.FR
rng = np.random.default_rng(61)


def test_sparse_msm_scalars_matches_oracle():
    n = 12
    ks = [0, 1, 0, lrand.rand_fr_int(rng), 0, 1,
          lrand.rand_fr_int(rng), 0, 0, lrand.rand_fr_int(rng), 0, 0]
    pts = [oracle.g1_mul(oracle.G1, i + 2) for i in range(n)]
    expected = None
    for p, k in zip(pts, ks):
        expected = oracle.g1_add(expected, oracle.g1_mul(p, k))

    points = g1_from_oracle(pts)
    v_can = jnp.asarray(fl.ints_to_limbs(ks, FR.nlimbs))
    sv = sparse.from_dense_scalars(v_can, nnz=8)   # pad beyond the 5 nnz
    out = jax.jit(lambda p, s: sparse.sparse_msm_scalars(
        G1, p, sparse.SparseVec(s.values, s.positions), c=4))(points, sv)
    assert g1_to_oracle(out) == expected


def test_sparse_inner_product():
    n = 8
    dense = lrand.rand_fr_ints(rng, n)
    ks = [0, 3, 0, 7, 0, 0, 11, 0]
    expect = sum(d * k for d, k in zip(dense, ks)) % R
    dm = jnp.asarray(FR.to_mont_ints(dense))
    sv = sparse.SparseVec(
        jnp.asarray(FR.to_mont_ints([3, 7, 11])),
        jnp.asarray(np.array([1, 3, 6], np.int32)))
    out = jax.jit(sparse.sparse_inner_product)(dm, sv)
    assert FR.from_mont_limbs(np.asarray(out)[..., 0]) == expect


def test_sparse_matvec_g1():
    nrows, ncols = 4, 3
    entries = [(0, 0, 5), (2, 0, 7), (1, 1, 1), (3, 2, 9)]
    pts = [oracle.g1_mul(oracle.G1, i + 1) for i in range(nrows)]
    points = g1_from_oracle(pts)
    M = sparse.insert_as_col_major(entries, nrows, ncols, nnz_max=2)
    out = sparse.matvec_g1(M, points)
    # out is a [ncols] batch of points on a leading axis
    for j in range(ncols):
        expect = None
        for r, c_, v in entries:
            if c_ == j:
                expect = oracle.g1_add(expect, oracle.g1_mul(pts[r], v))
        got = g1_to_oracle(Point(*(x[j] for x in out)))
        assert got == expect


def test_dump_load_roundtrip(tmp_path):
    v = jnp.asarray(FR.to_mont_ints(lrand.rand_fr_ints(rng, 6)))
    path = str(tmp_path / "vec.txt")
    lutil.dump_into_file(path, v)
    back = lutil.load_from_file(path)
    assert np.array_equal(np.asarray(fl.canon(FR, back)),
                          np.asarray(fl.canon(FR, v)))
    # populate_from_file_dist cycles
    filled = lutil.populate_from_file_dist(path, 10)
    assert filled.shape[-1] == 10
    assert np.array_equal(np.asarray(filled[..., 6]), np.asarray(back[..., 0]))


def test_point_batch_roundtrip(tmp_path):
    p = g1_generator((4,))
    path = str(tmp_path / "pts.npz")
    lutil.save_point_batch(path, p)
    back = lutil.load_point_batch(path)
    assert bool(np.all(np.asarray(G1.eq(p, back))))


def test_bp_circuit_parser(tmp_path):
    from legosnark_tpu.utils import bp_circuits
    text = """=CIRC=
4 2 8
1 2
0 1
1 0
"""
    path = tmp_path / "circ.txt"
    path.write_text(text)
    circs = bp_circuits.read_from_file(str(path))
    assert len(circs) == 1
    c = circs[0]
    assert (c.n_gates, c.n_constraints, c.n_bits) == (4, 2, 8)


@pytest.mark.slow  # pairing-heavy: minutes of XLA compile on the 2-CPU CI host
def test_cp_input_format():
    from legosnark_tpu.prototools import commit as cs
    from legosnark_tpu.gadgets import snark
    ck = cs.keygen(4, seed=1)
    v1 = jnp.asarray(FR.to_mont_ints(lrand.rand_fr_ints(rng, 4)))
    v2 = jnp.asarray(FR.to_mont_ints(lrand.rand_fr_ints(rng, 4)))
    pin, vin = snark.init_no_pub(ck, [v1, v2], rng=rng)
    assert len(pin.comm_slot) == 2 and len(vin.comm_in) == 2
    # verifier comm matches prover opening's commitment
    assert bool(np.all(np.asarray(
        G1.eq(pin.comm_slot[0].c.c, vin.comm_in[0].c))))
    # knowledge pairing check holds for the commitment pair
    assert bool(np.all(np.asarray(
        cs.check_knowledge(ck, vin.comm_in[0]))))
    # homomorphism: com(v1) + com(v2) opens to v1 + v2
    s = pin.comm_slot[0] + pin.comm_slot[1]
    direct = cs.commit(ck, fl.add(FR, v1, v2),
                       r_mont=s.r)
    assert bool(np.all(np.asarray(G1.eq(s.c.c, direct.c.c))))


def test_benchmark_subsystem():
    t = Benchmarkable("unit")
    with t.phase("work") as out:
        out.append(jnp.zeros((4,)))
    assert t.timing_micros("work") > 0
