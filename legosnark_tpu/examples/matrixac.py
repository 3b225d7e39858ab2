"""CPAC driver: n x n matrix multiplication as an arithmetic circuit.

Revives the intent of the reference's DEAD `matrixAC` driver
(`/root/reference/src/examples/matrixAC.cc:157-310`, excluded from its
build — SURVEY §2.1 row 27): express C = A*B as a circuit with n^3
multiplication gates o_{ikj} = a_{ik} * b_{kj} plus n^2 linear
constraints sum_k o_{ikj} = c_{ij}, and prove it with the CPAC gadget
(CPhadL for the gates + subspace QA-NIZK for wiring/linking —
`gadgets/arithcirc.py`). Prints per-phase timings in the reference's
`##`-tagged style (`matrixAC.cc:252-295`) and MYREQUIRE-asserts the
round-trip plus a tamper rejection.

Run: python -m legosnark_tpu.examples.matrixac [n]   (default n=2)
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..curve import bn254
from ..fields import limb as fl
from ..gadgets import arithcirc
from ..utils import rand as lrand
from ..utils.benchmark import Benchmarkable

FR = bn254.FR
R = bn254.R


def build_matmul_rel(n: int, rng) -> tuple:
    """Gates l=(a_ik), r=(b_kj) over all (i,k,j); constraints sum the
    products into the public c_ij (`matrixAC.cc:53-128` intent)."""
    A = [[lrand.rand_fr_ints(rng, 1)[0] for _ in range(n)]
         for _ in range(n)]
    B = [[lrand.rand_fr_ints(rng, 1)[0] for _ in range(n)]
         for _ in range(n)]
    C = [[sum(A[i][k] * B[k][j] for k in range(n)) % R
          for j in range(n)] for i in range(n)]

    gates = [(i, k, j) for i in range(n) for k in range(n)
             for j in range(n)]
    ng = len(gates)                      # n^3 gates
    l = [A[i][k] for (i, k, j) in gates]
    r = [B[k][j] for (i, k, j) in gates]
    o = [x * y % R for x, y in zip(l, r)]

    m = n * n
    W = np.zeros((m, 3 * ng), dtype=object)
    t = []
    for row, (i, j) in enumerate((i, j) for i in range(n)
                                 for j in range(n)):
        for g, (gi, gk, gj) in enumerate(gates):
            if gi == i and gj == j:
                W[row, 2 * ng + g] = 1   # + o_{ikj}
        t.append(C[i][j])
    rel = arithcirc.ACRel(n=ng, W=W, t=t)
    return rel, l, r, o


def run(n: int = 2, timer: Benchmarkable | None = None) -> dict:
    timer = timer or Benchmarkable(f"matrixac_{n}")
    rng = np.random.default_rng(0xAC0 + n)
    rel, l, r, o = build_matmul_rel(n, rng)

    to_mont = lambda xs: jnp.asarray(FR.to_mont_ints(xs))
    with timer.phase("keygen") as out:
        key = arithcirc.keygen(rel, seed=7)
        out.append(key.t_points.x)

    ds = lrand.rand_fr_mont(rng, 3)
    with timer.phase("prove") as out:
        pf = arithcirc.prove(key, to_mont(l), to_mont(r), to_mont(o), ds)
        out.append(pf.had_pi.x)

    with timer.phase("verify") as out:
        ok = arithcirc.verify(key, pf)
        out.append(ok)
    assert bool(np.all(np.asarray(ok))), "MYREQUIRE: CPAC verify failed"

    # tamper: flip one output wire -> must reject
    o_bad = list(o)
    o_bad[0] = (o_bad[0] + 1) % R
    pf_bad = arithcirc.prove(key, to_mont(l), to_mont(r),
                             to_mont(o_bad), ds)
    bad = arithcirc.verify(key, pf_bad)
    assert not bool(np.all(np.asarray(bad))), \
        "MYREQUIRE: tampered CPAC proof accepted"

    res = {}
    for phase in ("keygen", "prove", "verify"):
        us = timer.timing_micros(phase)
        res[f"{phase}_us"] = us
        print(f"## AC {phase} Time: {us} micros ({us / 1e6} s)")
    sizes = arithcirc.proof_size_group_elements()
    print(f"## AC proof size: {sizes}")
    print(f"matrixac n={n} (gates={rel.n}): VERIFY OK, tamper rejected")
    return res


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
