"""Gadget-level benchmark driver: the BASELINE.md reference configs.

Emits one JSON line per phase per config (mirroring the `##` tags of
`/root/reference/src/examples/matrixsc.cc:38-47` and
`hadamard.cc:98-105`), and writes the collected results to
BENCH_GADGETS.json.

Configs (BASELINE.md): CPlink N=2^10; CPhad n=2^14; CPpoly 20
variables; CPmmp 1024x1024. Each is gated by --max-level so partial
runs still produce artifacts on slow-compile backends:
  python bench_gadgets.py                 # all configs
  python bench_gadgets.py cplink cppoly   # subset
  python bench_gadgets.py --scale 1/4     # quarter-size variants
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timer():
    import jax

    class T:
        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *a):
            self.dt = time.perf_counter() - self.t0

        def fence(self, x):
            jax.block_until_ready(x)
            return x

    return T


RESULTS = []


def emit(config, phase, seconds, extra=None):
    rec = {"config": config, "phase": phase,
           "seconds": round(seconds, 4)}
    if extra:
        rec.update(extra)
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    # write incrementally: `timeout`'s SIGTERM would otherwise kill the
    # process without running main()'s finally, losing a partial run
    with open("BENCH_GADGETS.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def bench_cplink(log_n: int):
    import jax
    from legosnark_tpu.examples import cplink as drv
    T = _timer()
    with T() as t:
        drv.run(log_n)
    emit(f"cplink_2e{log_n}", "total", t.dt)


def bench_cppoly(d: int):
    import jax
    import jax.numpy as jnp
    from legosnark_tpu.curve import bn254
    from legosnark_tpu.fields import limb as fl
    from legosnark_tpu.gadgets import poly as cppoly
    from legosnark_tpu.utils import rand as lrand

    FR = bn254.FR
    rng = np.random.default_rng(3)
    T = _timer()

    with T() as t:
        key = cppoly.keygen(d, seed=1)
        jax.block_until_ready(key.bases[0].x)
    emit(f"cppoly_{d}var", "keygen", t.dt)

    v = lrand.rand_fr_mont(rng, 1 << d)
    r = lrand.rand_fr_mont(rng, d)

    with T() as t:
        cm = jax.jit(cppoly.commit)(key, v)
        jax.block_until_ready(cm.c.x)
    emit(f"cppoly_{d}var", "commit", t.dt)

    with T() as t:
        pf = jax.jit(cppoly.prove)(key, v, r)
        jax.block_until_ready(pf.witness.x)
    emit(f"cppoly_{d}var", "prove", t.dt)

    ans, ans_c = jax.jit(cppoly.compute_answer)(key, v, r)
    with T() as t:
        ok = jax.jit(cppoly.verify)(key, cm, ans_c, r, pf)
        jax.block_until_ready(ok)
    emit(f"cppoly_{d}var", "verify", t.dt,
         {"ok": bool(np.all(np.asarray(ok)))})


def bench_cpmmp(n: int):
    from legosnark_tpu.examples import matrixsc as drv
    res = drv.run(int(n).bit_length() - 1, fs=False)
    cfg = f"cpmmp_{n}x{n}"
    for phase in ("keygen_us", "commit_us", "prove_us", "verify_us"):
        emit(cfg, phase[:-3], res[phase] / 1e6)


def bench_cphad(log_n: int):
    from legosnark_tpu.examples import hadamard as drv
    from legosnark_tpu.utils import benchmark as bm
    timer = bm.Benchmarkable(f"bench_had_{log_n}")
    r = drv.hadsc(log_n, timer)
    cfg = f"cphad_2e{log_n}"
    for phase in ("had_keygen", "had_commit", "had_prove", "had_verify"):
        emit(cfg, phase[4:], timer.timing_micros(phase) / 1e6)
    r2 = drv.hadlipmaa(log_n, timer)
    cfg = f"cphadl_2e{log_n}"
    for phase in ("lip_keygen", "lip_commit", "lip_prove", "lip_verify"):
        emit(cfg, phase[4:], timer.timing_micros(phase) / 1e6)


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
    which = set(args) or {"cplink", "cphad", "cppoly", "cpmmp"}

    # subset runs keep other configs' existing records (fresh runs of a
    # config replace its old rows via emit's rewrite below)
    try:
        with open("BENCH_GADGETS.json") as fh:
            for rec in json.load(fh):
                if not any(rec["config"].startswith(w) for w in which):
                    RESULTS.append(rec)
    except (OSError, ValueError):
        pass

    import legosnark_tpu.config  # noqa: F401

    shrink = lambda v: max(2, int(round(v * scale)))
    try:
        if "cplink" in which:
            bench_cplink(shrink(10))
        if "cppoly" in which:
            bench_cppoly(shrink(20))
        if "cphad" in which:
            bench_cphad(shrink(14))
        if "cpmmp" in which:
            bench_cpmmp(1 << shrink(10))
    finally:
        with open("BENCH_GADGETS.json", "w") as fh:
            json.dump(RESULTS, fh, indent=1)


if __name__ == "__main__":
    main()
