"""CPmmp benchmark driver — mirror of `examples/matrixsc.cc`.

Builds random n x n A, B with C = A*B, runs the in-clear CPmmp
round-trip (the `OUTPUT_MATRIX_IN_CLEAR` configuration of
`/root/reference/src/examples/matrixsc.cc:1,18-47`), prints grep-able
`##` timings and proof size, and asserts verification (which the
reference never does).

Usage: python -m legosnark_tpu.examples.matrixsc [MIN_D] [MAX_D]
where n = 2^D per dimension (reference argv semantics,
`matrixsc.cc:59-68`).
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from .. import config  # noqa: F401  (compile cache)
from ..curve import bn254
from ..fields import limb as fl
from ..gadgets import matrix as cpmat
from ..utils import benchmark as bm

FR = bn254.FR
R = bn254.R


def rand_fr(rng, shape):
    flat = [int(x) for x in rng.integers(0, 1 << 63, size=int(np.prod(shape)))]
    arr = np.stack([FR.to_mont_int(v % R) for v in flat])
    return jnp.asarray(arr.reshape(tuple(shape) + (FR.nlimbs,)))


def mk_sigma_rand(rng, d):
    return {
        "eq_k": rand_fr(rng, (d,)),
        "eq_e": rand_fr(rng, (d,)),
        "prd_b": rand_fr(rng, (5,)),
        "prd_e": rand_fr(rng, (1,))[0],
    }


def matmul_mod(A, B):
    """Host int matmul mod r for known-answer data
    (`matrixsc.cc:82-91`)."""
    return [[sum(a * b for a, b in zip(row, col)) % R
             for col in zip(*B)] for row in A]


def run(d: int, timer: bm.Benchmarkable | None = None) -> dict:
    n = 1 << d
    timer = timer or bm.Benchmarkable(f"matrixsc_d{d}")
    rng = np.random.default_rng(17 + d)

    A = [[int(x) for x in rng.integers(0, 1 << 62, size=n)] for _ in range(n)]
    B = [[int(x) for x in rng.integers(0, 1 << 62, size=n)] for _ in range(n)]
    C = matmul_mod(A, B)
    to_m = lambda M: jnp.asarray(np.stack(
        [np.stack([FR.to_mont_int(x) for x in row]) for row in M]))
    Am, Bm, Cm = to_m(A), to_m(B), to_m(C)

    with timer.phase("keygen") as out:
        key = cpmat.keygen(n, seed=d)
        out.append(key.poly_key.bases[0].x)

    with timer.phase("commit") as out:
        a_cm = jax.jit(cpmat.commit_matrix)(key, Am)
        b_cm = jax.jit(cpmat.commit_matrix)(key, Bm)
        out.append((a_cm, b_cm))

    r = rand_fr(rng, (d,))
    s = rand_fr(rng, (d,))
    chal = rand_fr(rng, (d,))
    sr = mk_sigma_rand(rng, d)

    with timer.phase("prove") as out:
        pf = cpmat.prove_output_in_clear(key, Am, Bm, Cm, r, s, chal, sr)
        out.append(pf.t_comm.x)

    with timer.phase("verify") as out:
        ok = cpmat.verify_output_in_clear(key, a_cm, b_cm, Cm, pf, sr)
        out.append(ok)

    ok = bool(ok)
    # proof size in group elements (cf. `matrixsc.h:44-50`)
    d_sc = d
    proof_group_elems = (
        pf.sc_proof.h_comms.x.shape[0] * pf.sc_proof.h_comms.x.shape[1]
        + 2 * d_sc        # ZKEq (a) + responses counted as field elems
        + 2 * 2 * d       # two CPpoly proofs: 2d witnesses each... per-var
        + 2               # answer commitments
        + 3)              # prd proof group elements
    print(f"=== CPmmp n={n}x{n} (d={d}) ===")
    for phase in ("keygen", "commit", "prove", "verify"):
        bm.print_bm(f"matrix_{phase}_d{d}", timer.timing_micros(phase))
    print(f"## proof size (group elements): {proof_group_elems}")
    print(f"VERIFY {'OK' if ok else 'FAIL'}")
    if not ok:
        raise SystemExit(1)
    return {
        "n": n, "ok": ok,
        "prove_us": timer.timing_micros("prove"),
        "verify_us": timer.timing_micros("verify"),
        "commit_us": timer.timing_micros("commit"),
    }


def main(argv):
    min_d = int(argv[0]) if argv else 2
    max_d = int(argv[1]) if len(argv) > 1 else min_d
    for d in range(min_d, max_d + 1):
        run(d)


if __name__ == "__main__":
    main(sys.argv[1:])
