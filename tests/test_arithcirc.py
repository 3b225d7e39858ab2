"""CPAC (Hadamard ∘ Linear) round-trip on a tiny circuit.

First-ever execution coverage for the arithcirc capability (the
reference's version is dead code — SURVEY §2.1 row 22; behavior defined
by `/root/reference/src/gadgets/arithcirc.cc:106-273`'s intent).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legosnark_tpu.curve import bn254
from legosnark_tpu.fields import limb as fl
from legosnark_tpu.gadgets import arithcirc
from legosnark_tpu.utils import rand as lrand

R = bn254.R
FR = bn254.FR
rng = np.random.default_rng(81)


def to_mont(ints):
    return jnp.asarray(FR.to_mont_ints(ints))


@pytest.mark.slow
def test_cpac_roundtrip_and_tamper():
    # circuit: 4 gates o = l*r; one linear constraint l_0 + o_3 = t_0,
    # one more r_1 - o_0 = t_1
    n = 4
    l = lrand.rand_fr_ints(rng, n)
    r = lrand.rand_fr_ints(rng, n)
    o = [x * y % R for x, y in zip(l, r)]
    W = np.zeros((2, 3 * n), dtype=object)
    W[0, 0] = 1          # l_0
    W[0, 2 * n + 3] = 1  # o_3
    W[1, n + 1] = 1      # r_1
    W[1, 2 * n + 0] = R - 1  # -o_0
    t = [(l[0] + o[3]) % R, (r[1] - o[0]) % R]
    rel = arithcirc.ACRel(n=n, W=W, t=t)

    key = arithcirc.keygen(rel, seed=5)
    ds = lrand.rand_fr_mont(rng, 3)
    pf = arithcirc.prove(key, to_mont(l), to_mont(r), to_mont(o), ds)
    assert bool(np.all(np.asarray(arithcirc.verify(key, pf))))

    # tampered wires: o_0 off by one -> BOTH the hadamard and the
    # linear legs must reject
    o_bad = list(o)
    o_bad[0] = (o_bad[0] + 1) % R
    pf_bad = arithcirc.prove(key, to_mont(l), to_mont(r), to_mont(o_bad),
                             ds)
    assert not bool(np.all(np.asarray(arithcirc.verify(key, pf_bad))))
