"""CPlink end-to-end demo — mirror of `examples/cplink.cc`.

Commits the same vector u under two base sets, builds the 2 x (2 + N)
linking relation, runs subspace keygen/prove/verify and asserts success
(`/root/reference/src/examples/cplink.cc:17-114`; default N there is
2^10 — pass a smaller exponent on CPU).

Usage: python -m legosnark_tpu.examples.cplink [LOG_N]
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from .. import config  # noqa: F401
from ..curve import bn254
from ..curve.group import Point, G1, g1_generator
from ..curve import msm as msm_mod
from ..fields import limb as fl
from ..gadgets import subspace
from ..utils import benchmark as bm

FR = bn254.FR
R = bn254.R


def run(log_n: int) -> bool:
    n = 1 << log_n
    timer = bm.Benchmarkable(f"cplink_{log_n}")
    rng = np.random.default_rng(23)

    # two independent base sets + blinding bases (real random bases,
    # unlike the reference's all-generator shortcut, `commit.h:129-139`)
    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    exps = jnp.asarray(np.stack([
        fl.int_to_limbs(int(rng.integers(1, 1 << 62)) *
                        int(rng.integers(1, 1 << 62)) % R, FR.nlimbs)
        for _ in range(2 * n + 2)]))
    pts = msm_mod.batch_scalar_mul(G1, table, exps, c=8)
    h = Point(*jax.tree.map(lambda x: x[0], pts))
    f = Point(*jax.tree.map(lambda x: x[1], pts))
    bases_h = Point(*jax.tree.map(lambda x: x[2 : n + 2], pts))
    bases_f = Point(*jax.tree.map(lambda x: x[n + 2 :], pts))

    # witness: u, rH, rF; commitments under both base sets
    u = jnp.asarray(np.stack([
        fl.int_to_limbs(int(rng.integers(0, 1 << 62)), FR.nlimbs)
        for _ in range(n)]))
    rand_fr = lambda: (int(rng.integers(1, 1 << 62))
                       * int(rng.integers(1, 1 << 62))) % R
    rH = jnp.asarray(fl.int_to_limbs(rand_fr(), FR.nlimbs))
    rF = jnp.asarray(fl.int_to_limbs(rand_fr(), FR.nlimbs))

    with timer.phase("commit") as out:
        cH = G1.add(msm_mod.msm(G1, bases_h, u), G1.scalar_mul(h, rH))
        cF = G1.add(msm_mod.msm(G1, bases_f, u), G1.scalar_mul(f, rF))
        out.append((cH.x, cF.x))

    M = subspace.make_linking_relation(h, f, bases_h, bases_f)

    with timer.phase("keygen") as out:
        key = subspace.keygen(M, seed=7)
        out.append(key.P.x)

    # w = [rH, rF, u] in Montgomery form for prove()
    to_mont = lambda canon: fl.to_mont(FR, canon)
    w = jnp.concatenate(
        [to_mont(rH)[None], to_mont(rF)[None], to_mont(u)], axis=0)

    with timer.phase("prove") as out:
        pi = subspace.prove(key, w)
        out.append(pi.x)

    x = Point(jnp.stack([cH.x, cF.x]), jnp.stack([cH.y, cF.y]),
              jnp.stack([cH.z, cF.z]))
    with timer.phase("verify") as out:
        ok = subspace.verify(key, x, pi)
        out.append(ok)

    ok = bool(ok)
    print(f"=== CPlink N=2^{log_n} ===")
    for phase in ("commit", "keygen", "prove", "verify"):
        bm.print_bm(f"cplink_{phase}", timer.timing_micros(phase))
    print(f"VERIFY {'OK' if ok else 'FAIL'}")
    # MYREQUIRE-style assert (`cplink.cc:114`)
    if not ok:
        raise SystemExit(1)
    return ok


def main(argv):
    log_n = int(argv[0]) if argv else 4
    run(log_n)


if __name__ == "__main__":
    main(sys.argv[1:])
