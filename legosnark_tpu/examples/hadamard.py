"""Hadamard benchmark driver — mirror of `examples/hadamard.cc`.

Benchmarks both Hadamard schemes on u ⊙ u = u^2 for a range of d:
`hadsc` (CPHad + CPpoly + sumcheck, `hadamard.cc:78-106`) and
`hadlipmaa` (CPHadL, `hadamard.cc:46-76`), printing `##`-tagged
timings, and asserts both verifications. CPHad runs in the default
non-interactive Fiat-Shamir mode.

Usage: python -m legosnark_tpu.examples.hadamard [MIN_D] [MAX_D]
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from .. import config  # noqa: F401
from ..curve import bn254
from ..fields import limb as fl
from ..gadgets import hadamard as cphad, lipmaa
from ..utils import benchmark as bm
from ..utils import rand as lrand

FR = bn254.FR
R = bn254.R


def _vec_pair(rng, n):
    """(u, u^2) as Montgomery [L, n] arrays."""
    u_ints = lrand.rand_fr_ints(rng, n)
    sq_ints = [x * x % R for x in u_ints]
    return (jnp.asarray(FR.to_mont_ints(u_ints)),
            jnp.asarray(FR.to_mont_ints(sq_ints)))


def hadsc(d: int, timer: bm.Benchmarkable) -> dict:
    """CPHad (sumcheck-based) on u ⊙ u (`hadamard.cc:78-106`),
    Fiat-Shamir mode."""
    n = 1 << d
    rng = np.random.default_rng(31 + d)
    um, sqm = _vec_pair(rng, n)

    with timer.phase("had_keygen") as out:
        key = cphad.keygen(n, seed=d)
        out.append(key.poly_key.bases[0].x)

    with timer.phase("had_commit") as out:
        a_cm = jax.jit(cphad.commit_vec)(key, um)
        c_cm = jax.jit(cphad.commit_vec)(key, sqm)
        out.append((a_cm, c_cm))

    nonces = cphad.make_nonces(d, seed=d)

    with timer.phase("had_prove") as out:
        pf = cphad.prove_fs(key, um, um, sqm, a_cm, a_cm, c_cm, nonces)
        out.append(pf.t_ans_comm.x)

    with timer.phase("had_verify") as out:
        ok = cphad.verify_fs(key, a_cm, a_cm, c_cm, pf)
        out.append(ok)
    return {"ok": bool(np.all(np.asarray(ok)))}


def hadlipmaa(d: int, timer: bm.Benchmarkable) -> dict:
    """CPHadL (`hadamard.cc:46-76`)."""
    n = 1 << d
    rng = np.random.default_rng(41 + d)
    um, sqm = _vec_pair(rng, n)

    with timer.phase("lip_keygen") as out:
        key = lipmaa.keygen(n, seed=d)
        out.append(key.chi_pows.x)

    ds = lrand.rand_fr_mont(rng, 3)  # commitment blinding d1, d2, d3
    with timer.phase("lip_commit") as out:
        ca = lipmaa.commit(key.interp, um, ds[..., 0:1])
        cb = lipmaa.commit(key.interp, um, ds[..., 1:2])
        cc = lipmaa.commit(key.interp, sqm, ds[..., 2:3])
        out.append((ca.c.x, cb.c.x, cc.c.x))

    with timer.phase("lip_prove") as out:
        pi = lipmaa.prove(key, um, um, sqm, ds)
        out.append(pi.x)

    with timer.phase("lip_verify") as out:
        ok = lipmaa.verify(key, ca, cb, cc, pi)
        out.append(ok)
    return {"ok": bool(np.all(np.asarray(ok)))}


def run(d: int) -> None:
    timer = bm.Benchmarkable(f"hadamard_d{d}")
    r1 = hadlipmaa(d, timer)
    r2 = hadsc(d, timer)
    print(f"=== Hadamard d={d} (n={1 << d}) ===")
    for phase in ("lip_keygen", "lip_commit", "lip_prove", "lip_verify",
                  "had_keygen", "had_commit", "had_prove", "had_verify"):
        bm.print_bm(f"{phase}_d{d}", timer.timing_micros(phase))
    print(f"VERIFY lipmaa {'OK' if r1['ok'] else 'FAIL'} | "
          f"hadsc {'OK' if r2['ok'] else 'FAIL'}")
    if not (r1["ok"] and r2["ok"]):
        raise SystemExit(1)


def main(argv):
    min_d = int(argv[0]) if argv else 3
    max_d = int(argv[1]) if len(argv) > 1 else min_d
    for d in range(min_d, max_d + 1):
        run(d)


if __name__ == "__main__":
    main(sys.argv[1:])
