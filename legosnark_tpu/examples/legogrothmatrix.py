"""Groth16 matmul baseline driver — mirror of `examples/legogrothmatrix.cc`.

Builds the R1CS for C = A*B via inner-product constraint ladders
(`/root/reference/src/examples/legogrothmatrix.cc:64-124`), runs the
real Groth16 generator/prover/verifier on the framework's MSM + NTT +
pairing kernels, prints KG/prove/verify timings
(`legogrothmatrix.cc:179-188`), and — like the reference's
commit-and-prove emulation (`:151-152,163-177`) — also times the extra
commitment MSM a LegoSNARK composition would add.

Usage: python -m legosnark_tpu.examples.legogrothmatrix [MIN_N] [MAX_N]
(n doubles per step, reference semantics `legogrothmatrix.cc:195-201`).
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from .. import config  # noqa: F401
from ..curve import bn254
from ..fields import limb as fl
from ..curve.group import G1, g1_generator
from ..curve import msm as msm_mod
from ..gadgets import groth16
from ..utils import benchmark as bm
from ..utils import rand as lrand

FR = bn254.FR
R = bn254.R


def run(n: int) -> dict:
    timer = bm.Benchmarkable(f"groth16_n{n}")
    rng = np.random.default_rng(67 + n)
    r1cs, assign = groth16.matmul_r1cs(n)
    A = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    B = [[lrand.rand_fr_int(rng) for _ in range(n)] for _ in range(n)]
    z, C = assign(A, B)

    # sanity: every constraint satisfied (pb.is_satisfied() parity,
    # `legogrothmatrix.cc:120`)
    for ar, br, cr in zip(r1cs.A, r1cs.B, r1cs.C):
        av = sum(c * z[v] for v, c in ar) % R
        bv = sum(c * z[v] for v, c in br) % R
        cv = sum(c * z[v] for v, c in cr) % R
        assert av * bv % R == cv, "R1CS unsatisfied"

    with timer.phase("keygen") as out:
        pk, vk = groth16.setup(r1cs, seed=n)
        out.append(pk.a_query.x)

    with timer.phase("prove") as out:
        pf = groth16.prove(pk, r1cs, z, seed=n)
        out.append(pf.a.x)

    public = [z[i] for i in range(1, r1cs.num_public + 1)]
    with timer.phase("verify") as out:
        ok = groth16.verify(vk, public, pf)
        out.append(ok)

    # commit-and-prove emulation: the extra MSM committing the witness
    # wires (the reference adds two MSMs + a CPlink verify ladder,
    # `legogrothmatrix.cc:151-152,163-177`)
    wit = jnp.asarray(fl.ints_to_limbs(
        [z[i] % R for i in range(1 + r1cs.num_public, r1cs.num_vars)],
        FR.nlimbs))
    bases = groth16.msm_mod.batch_scalar_mul(
        G1, msm_mod.fixed_base_table(G1, g1_generator(), c=8),
        jnp.asarray(fl.ints_to_limbs(
            lrand.rand_fr_ints(rng, wit.shape[-1]), FR.nlimbs)), c=8)
    with timer.phase("commit_emul") as out:
        cm = msm_mod.msm(G1, bases, wit)
        out.append(cm.x)

    ok = bool(np.all(np.asarray(ok)))
    print(f"=== Groth16 matmul n={n}x{n} "
          f"({len(r1cs.A)} constraints, {r1cs.num_vars} vars) ===")
    for phase in ("keygen", "prove", "verify", "commit_emul"):
        bm.print_bm(f"groth16_{phase}_n{n}", timer.timing_micros(phase))
    sz = groth16.proof_size_group_elements()
    print(f"## proof size: {sz['g1']} G1 + {sz['g2']} G2")
    print(f"VERIFY {'OK' if ok else 'FAIL'}")
    if not ok:
        raise SystemExit(1)
    return {"n": n, "ok": ok,
            "prove_us": timer.timing_micros("prove"),
            "verify_us": timer.timing_micros("verify")}


def main(argv):
    min_n = int(argv[0]) if argv else 2
    max_n = int(argv[1]) if len(argv) > 1 else min_n
    n = min_n
    while n <= max_n:
        run(n)
        n *= 2


if __name__ == "__main__":
    main(sys.argv[1:])
