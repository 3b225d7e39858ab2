"""Groth16 round-trip on a tiny matmul R1CS + tamper checks.

Covers the `legogrothmatrix` baseline capability
(`/root/reference/src/examples/legogrothmatrix.cc:64-190`).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.gadgets import groth16
from legosnark_tpu.utils import rand as lrand

R = bn254.R
rng = np.random.default_rng(71)


@pytest.mark.slow
def test_groth16_matmul_roundtrip():
    n = 2
    r1cs, assign = groth16.matmul_r1cs(n)
    A = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    B = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    z, C = assign(A, B)

    # constraints hold
    for ar, br, cr in zip(r1cs.A, r1cs.B, r1cs.C):
        av = sum(c * z[v] for v, c in ar) % R
        bv = sum(c * z[v] for v, c in br) % R
        cv = sum(c * z[v] for v, c in cr) % R
        assert av * bv % R == cv

    pk, vk = groth16.setup(r1cs, seed=2)
    pf = groth16.prove(pk, r1cs, z, seed=3)
    public = [z[i] for i in range(1, r1cs.num_public + 1)]
    assert bool(np.all(np.asarray(groth16.verify(vk, public, pf))))

    # wrong public output must fail
    bad = list(public)
    bad[0] = (bad[0] + 1) % R
    assert not bool(np.all(np.asarray(groth16.verify(vk, bad, pf))))
