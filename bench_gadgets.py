"""Gadget-level benchmark driver: the BASELINE.md reference configs.

Emits one JSON line per phase per config (mirroring the `##` tags of
`/root/reference/src/examples/matrixsc.cc:38-47` and
`hadamard.cc:98-105`), and writes the collected results to
BENCH_GADGETS.json. Every phase row carries the warm steady-state
`seconds`; cold first-call costs (XLA compile + run, persistently
cached across processes) are reported as `cold_s` where they differ.

Configs (BASELINE.md): CPlink N=2^10; CPhad + CPhadL n=2^14; CPsc
16-variate; CPpoly 20 variables; CPmmp 1024x1024.
  python bench_gadgets.py                 # all configs
  python bench_gadgets.py cplink cppoly   # subset
  python bench_gadgets.py --scale 1/4     # quarter-size variants
Subset/scaled runs only replace the exact config rows they re-emit;
all other recorded rows are preserved.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

KNOWN = ("cplink", "cppoly", "cpmmp", "cphad", "cpsc")

RESULTS = []


def _flush():
    # atomic: a SIGKILL mid-write must never leave truncated JSON
    tmp = "BENCH_GADGETS.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    os.replace(tmp, "BENCH_GADGETS.json")


def emit(config, phase, seconds, extra=None):
    rec = {"config": config, "phase": phase,
           "seconds": round(seconds, 4)}
    if extra:
        rec.update({k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in extra.items()})
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    _flush()  # incremental: partial runs still produce artifacts


def _sync(x):
    """Sync EVERY leaf (the first leaf can be a pass-through input —
    e.g. a proof's challenge field — which would stop the clock before
    the async MSM work lands), then force a host copy of the last."""
    import jax
    jax.block_until_ready(x)
    return np.asarray(jax.tree_util.tree_leaves(x)[-1])


def _timed(fn):
    """(result, seconds) with a REAL device sync."""
    t0 = time.perf_counter()
    out = fn()
    _sync(out)
    return out, time.perf_counter() - t0


def bench_cplink(log_n: int):
    from legosnark_tpu.examples import cplink as drv
    t0 = time.perf_counter()
    res = drv.run(log_n)
    total = time.perf_counter() - t0
    cfg = f"cplink_2e{log_n}"
    for phase in ("commit", "keygen", "prove", "verify"):
        emit(cfg, phase, res[f"{phase}_us"] / 1e6)
    emit(cfg, "total", total, {"ok": res["ok"]})


def bench_cppoly(d: int):
    import jax
    from legosnark_tpu.gadgets import poly as cppoly
    from legosnark_tpu.utils import rand as lrand

    cfg = f"cppoly_{d}var"
    rng = np.random.default_rng(3)
    srs = os.path.join(
        os.environ.get("LEGOSNARK_SRS_CACHE",
                       os.path.expanduser("~/.cache/legosnark_srs")),
        f"pst13_d{d}_s1.npz")
    hit = os.path.exists(srs)
    key, dt = _timed(lambda: cppoly.keygen_cached(d, seed=1))
    emit(cfg, "keygen", dt, {"srs_cache_hit": hit})

    v = lrand.rand_fr_mont_fast(rng, 1 << d)
    r = lrand.rand_fr_mont(rng, d)

    cm, cold = _timed(lambda: cppoly.commit_staged(key, v))
    cm, warm = _timed(lambda: cppoly.commit_staged(key, v))
    emit(cfg, "commit", warm, {"cold_s": cold})

    pf, cold = _timed(lambda: cppoly.prove_staged(key, v, r))
    pf, warm = _timed(lambda: cppoly.prove_staged(key, v, r))
    emit(cfg, "prove", warm, {"cold_s": cold})

    (ans, ans_c), _ = _timed(lambda: cppoly.compute_answer_staged(key, v, r))

    def vfy():
        import jax.numpy as jnp
        return jnp.logical_and(
            jnp.all(cppoly.check_commit_staged(key, cm)),
            jnp.all(cppoly.verify_staged(key, cm, ans_c, r, pf)))

    ok, cold = _timed(vfy)
    ok, warm = _timed(vfy)
    emit(cfg, "verify", warm,
         {"cold_s": cold, "ok": bool(np.all(np.asarray(ok)))})


def bench_cpmmp(n: int):
    from legosnark_tpu.examples import matrixsc as drv
    res = drv.run(int(n).bit_length() - 1, fs=False)
    cfg = f"cpmmp_{n}x{n}"
    emit(cfg, "keygen", res["keygen_us"] / 1e6,
         {"srs_cache_hit": res.get("srs_cache_hit")})
    emit(cfg, "commit", res["commit_us"] / 1e6,
         {"cold_s": res.get("commit_cold_s")})
    emit(cfg, "prove", res["prove_us"] / 1e6,
         {"cold_s": res.get("prove_cold_s")})
    emit(cfg, "verify", res["verify_us"] / 1e6,
         {"cold_s": res.get("verify_cold_s"), "ok": res["ok"]})


def bench_cphad(log_n: int):
    """CPhad (sumcheck) + CPhadL (Lipmaa) at n=2^log_n, staged HV mode
    (`examples/hadamard.cc:46-105` shapes)."""
    import jax
    import jax.numpy as jnp
    from legosnark_tpu.curve import bn254
    from legosnark_tpu.fields import limb as fl
    from legosnark_tpu.gadgets import hadamard as cphad, lipmaa
    from legosnark_tpu.utils import rand as lrand

    FR = bn254.FR
    n = 1 << log_n
    d = log_n
    rng = np.random.default_rng(31 + d)
    u = lrand.rand_fr_mont_fast(rng, n)
    sq = jax.jit(lambda x: fl.mont_mul(FR, x, x))(u)

    # --- CPhad (CPpoly + sumcheck) -----------------------------------
    cfg = f"cphad_2e{log_n}"
    srs = os.path.join(
        os.environ.get("LEGOSNARK_SRS_CACHE",
                       os.path.expanduser("~/.cache/legosnark_srs")),
        f"pst13_d{d}_s{d}.npz")
    hit = os.path.exists(srs)
    key, dt = _timed(lambda: cphad.keygen_cached(n, seed=d))
    emit(cfg, "keygen", dt, {"srs_cache_hit": hit})

    def commits():
        return (cphad.commit_vec_staged(key, u),
                cphad.commit_vec_staged(key, sq))

    (a_cm, c_cm), cold = _timed(commits)
    (a_cm, c_cm), warm = _timed(commits)
    emit(cfg, "commit", warm, {"cold_s": cold})

    nonces = cphad.make_nonces(d, seed=d)
    rho = lrand.rand_fr_mont(rng, d)
    chal = lrand.rand_fr_mont(rng, d)
    hv = {"eq_e": lrand.rand_fr_mont(rng, d),
          "prd_e": lrand.rand_fr_mont(rng, 1)}
    sigma_rand = dict(nonces)
    sigma_rand.update(hv)

    prove = lambda: cphad.prove_staged(key, u, u, sq, rho, chal, sigma_rand)
    _, cold = _timed(prove)
    pf, warm = _timed(prove)
    emit(cfg, "prove", warm, {"cold_s": cold})

    vfy = lambda: cphad.verify_staged(key, a_cm, a_cm, c_cm, pf, hv)
    ok, cold = _timed(vfy)
    ok, warm = _timed(vfy)
    emit(cfg, "verify", warm,
         {"cold_s": cold, "ok": bool(np.all(np.asarray(ok)))})

    # --- CPhadL (Lipmaa quotient pipeline) ---------------------------
    cfg = f"cphadl_2e{log_n}"
    lsrs = os.path.join(os.path.dirname(srs), f"lipmaa_n{n}_s{d}.npz")
    hit = os.path.exists(lsrs)
    lkey, dt = _timed(lambda: lipmaa.keygen_cached(n, seed=d))
    emit(cfg, "keygen", dt, {"srs_cache_hit": hit})

    ds = lrand.rand_fr_mont(rng, 3)
    commit_jit = jax.jit(lipmaa.commit)

    def lcommits():
        return (commit_jit(lkey.interp, u, ds[..., 0:1]),
                commit_jit(lkey.interp, u, ds[..., 1:2]),
                commit_jit(lkey.interp, sq, ds[..., 2:3]))

    (ca, cb, cc), cold = _timed(lcommits)
    (ca, cb, cc), warm = _timed(lcommits)
    emit(cfg, "commit", warm, {"cold_s": cold})

    prove_jit = jax.jit(lipmaa.prove)
    pi, cold = _timed(lambda: prove_jit(lkey, u, u, sq, ds))
    pi, warm = _timed(lambda: prove_jit(lkey, u, u, sq, ds))
    emit(cfg, "prove", warm, {"cold_s": cold})

    # EAGER verify: pairings route through the shared decomposed graphs
    ok, cold = _timed(lambda: lipmaa.verify(lkey, ca, cb, cc, pi))
    ok, warm = _timed(lambda: lipmaa.verify(lkey, ca, cb, cc, pi))
    emit(cfg, "verify", warm,
         {"cold_s": cold, "ok": bool(np.all(np.asarray(ok)))})


def bench_cpsc(d: int):
    """Standalone 16-variate generalized sumcheck (CPsc,
    `/root/reference/src/gadgets/sumcheck.{h,cc}`): t = sum_p a(p)b(p)
    over committed 2^d-entry MLEs, staged HV mode."""
    import jax
    import jax.numpy as jnp
    from legosnark_tpu.gadgets import poly as cppoly, sumcheck as cpsc
    from legosnark_tpu.utils import rand as lrand

    cfg = f"cpsc_{d}var"
    rng = np.random.default_rng(7 + d)
    srs = os.path.join(
        os.environ.get("LEGOSNARK_SRS_CACHE",
                       os.path.expanduser("~/.cache/legosnark_srs")),
        f"pst13_d{d}_s{d}.npz")
    hit = os.path.exists(srs)
    key, dt = _timed(lambda: cppoly.keygen_cached(d, seed=d))
    emit(cfg, "keygen", dt, {"srs_cache_hit": hit})

    a = lrand.rand_fr_mont_fast(rng, 1 << d)
    b = lrand.rand_fr_mont_fast(rng, 1 << d)
    tables = jax.jit(lambda x, y: jnp.stack([x, y]))(a, b)

    def commits():
        return (cppoly.commit_staged(key, a), cppoly.commit_staged(key, b))

    (a_cm, b_cm), cold = _timed(commits)
    (a_cm, b_cm), warm = _timed(commits)
    emit(cfg, "commit", warm, {"cold_s": cold})

    rand = {"eq_k": lrand.rand_fr_mont(rng, d),
            "prd_b": lrand.rand_fr_mont(rng, 5),
            "eq_e": lrand.rand_fr_mont(rng, d),
            "prd_e": lrand.rand_fr_mont(rng, 1)}
    chal = lrand.rand_fr_mont(rng, d)

    prove = lambda: cpsc.prove(key, tables, rand, challenges=chal,
                               staged=True)
    _, cold = _timed(prove)
    (pf, z0), warm = _timed(prove)
    emit(cfg, "prove", warm, {"cold_s": cold})

    t_comm = jax.jit(cpsc.commit_scalar)(key.g1, z0)

    vfy = lambda: cpsc.verify(key, t_comm, (a_cm, b_cm), pf, rand=rand,
                              beta_point_fn=None, staged=True)
    ok, cold = _timed(vfy)
    ok, warm = _timed(vfy)
    emit(cfg, "verify", warm,
         {"cold_s": cold, "ok": bool(np.all(np.asarray(ok)))})


def main():
    import signal
    # let `timeout`-style SIGTERM unwind through finally (artifact flush)
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    args = [a for a in sys.argv[1:]]
    scale = 1
    if "--scale" in args:
        i = args.index("--scale")
        scale = eval(args[i + 1])  # e.g. 1/4
        del args[i : i + 2]
    bad = [a for a in args if a not in KNOWN]
    if bad:
        sys.exit(f"unknown config selector(s) {bad}; known: {KNOWN} "
                 f"(cphad runs both cphad and cphadl)")
    which = set(args) or set(KNOWN)

    shrink = lambda v: max(2, int(round(v * scale)))
    # exact config names this invocation will emit — ONLY those rows are
    # replaced; everything else recorded earlier is preserved
    will_emit = set()
    if "cplink" in which:
        will_emit.add(f"cplink_2e{shrink(10)}")
    if "cppoly" in which:
        will_emit.add(f"cppoly_{shrink(20)}var")
    if "cphad" in which:
        will_emit.update({f"cphad_2e{shrink(14)}", f"cphadl_2e{shrink(14)}"})
    if "cpsc" in which:
        will_emit.add(f"cpsc_{shrink(16)}var")
    if "cpmmp" in which:
        will_emit.add(f"cpmmp_{1 << shrink(10)}x{1 << shrink(10)}")

    try:
        with open("BENCH_GADGETS.json") as fh:
            for rec in json.load(fh):
                if (isinstance(rec, dict)
                        and rec.get("config") not in will_emit):
                    RESULTS.append(rec)
    except (OSError, ValueError, TypeError, KeyError):
        pass

    import legosnark_tpu.config  # noqa: F401

    try:
        if "cplink" in which:
            bench_cplink(shrink(10))
        if "cppoly" in which:
            bench_cppoly(shrink(20))
        if "cpsc" in which:
            bench_cpsc(shrink(16))
        if "cphad" in which:
            bench_cphad(shrink(14))
        if "cpmmp" in which:
            bench_cpmmp(1 << shrink(10))
    finally:
        _flush()


if __name__ == "__main__":
    main()
