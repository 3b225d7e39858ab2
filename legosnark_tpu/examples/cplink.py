"""CPlink end-to-end demo — mirror of `examples/cplink.cc`.

Commits the same vector u under two base sets, builds the 2 x (2 + N)
linking relation, runs subspace keygen/prove/verify and asserts success
(`/root/reference/src/examples/cplink.cc:17-114`; default N there is
2^10 — pass a smaller exponent on CPU).

Keygen uses the reference's scalar fast path (`subspace.h:19`
`scalarsAvailable`): the relation matrix is known as Fr scalars over G,
so P = (k^T sM)*G is a field contraction + one fixed-base batch exp.

Usage: python -m legosnark_tpu.examples.cplink [LOG_N]
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from .. import config  # noqa: F401
from ..curve import bn254
from ..curve.group import Point, G1, g1_generator, point_stack
from ..curve import msm as msm_mod
from ..fields import limb as fl
from ..gadgets import subspace
from ..utils import benchmark as bm
from ..utils import rand as lrand

FR = bn254.FR
R = bn254.R


def run(log_n: int) -> bool:
    n = 1 << log_n
    timer = bm.Benchmarkable(f"cplink_{log_n}")
    rng = np.random.default_rng(23)

    # two independent base sets + blinding bases (real random bases,
    # unlike the reference's all-generator shortcut, `commit.h:129-139`)
    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    exp_ints = lrand.rand_fr_ints(rng, 2 * n + 2)
    exps = jnp.asarray(fl.ints_to_limbs(exp_ints, FR.nlimbs))  # [L, 2n+2]
    pts = msm_mod.batch_scalar_mul(G1, table, exps, c=8)
    sl = lambda a, b: Point(*(x[..., a:b] for x in pts))
    h, f = sl(0, 1), sl(1, 2)
    bases_h, bases_f = sl(2, n + 2), sl(n + 2, 2 * n + 2)

    # witness: u, rH, rF; commitments under both base sets
    u_ints = lrand.rand_fr_ints(rng, n)
    u = jnp.asarray(fl.ints_to_limbs(u_ints, FR.nlimbs))       # [L, n]
    rH_i, rF_i = lrand.rand_fr_int(rng), lrand.rand_fr_int(rng)
    rH = jnp.asarray(fl.int_to_limbs(rH_i, FR.nlimbs)[:, None])
    rF = jnp.asarray(fl.int_to_limbs(rF_i, FR.nlimbs)[:, None])

    with timer.phase("commit") as out:
        cH = G1.add(msm_mod.msm(G1, bases_h, u), G1.scalar_mul(h, rH))
        cF = G1.add(msm_mod.msm(G1, bases_f, u), G1.scalar_mul(f, rF))
        out.append((cH.x, cF.x))

    # scalar mirror of the linking relation (rows as Fr over G):
    #   [ e_h  0  s_g... ]      where base = s * G for each column
    #   [ 0  e_f  s_f... ]
    sM_rows = np.stack([
        FR.to_mont_ints([exp_ints[0], 0] + exp_ints[2 : n + 2]),
        FR.to_mont_ints([0, exp_ints[1]] + exp_ints[n + 2 :]),
    ])                                                          # [2, L, t]
    with timer.phase("keygen") as out:
        key = subspace.keygen_scalar(jnp.asarray(sM_rows), seed=7)
        out.append(key.P.x)

    # w = [rH, rF, u] in Montgomery form for prove()
    to_mont = lambda canon: fl.to_mont(FR, canon)
    w = jnp.concatenate([to_mont(rH), to_mont(rF), to_mont(u)], axis=-1)

    with timer.phase("prove") as out:
        pi = subspace.prove(key, w)
        out.append(pi.x)

    x = Point(*(jnp.concatenate([a, b], axis=-1)
                for a, b in zip(cH, cF)))
    with timer.phase("verify") as out:
        ok = subspace.verify(key, x, pi)
        out.append(ok)

    ok = bool(np.all(np.asarray(ok)))
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
