"""Benchmark entry: G1 MSM throughput (the north-star metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}
(final line; earlier lines are per-size progress).
Default run targets real TPU (driver invocation); `--quick` runs a
small CPU-safe configuration.

vs_baseline: ratio against the reference's CPU Pippenger throughput.
The reference publishes no numbers (BASELINE.md), so the baseline
constant is the measured order of magnitude of libff's OpenMP
`multiExpMA` on a multicore server CPU for 2^20 points (~1e6
points/sec) — documented here as the comparison anchor until the
driver produces a measured reference number.

Roofline (v5e, 13-bit limbs, L=20, measured round 4): one fused
Pallas Montgomery mul sustains ~1.4e9 muls/s at 2^18 lanes (~1.7e12
u32 mult-adds/s ~ VPU peak); an RCB complete add (14 muls with MXU
Montgomery reduction + lazy carries) costs ~5ms per 2^18-wide batch.
Per window the MSM pays ~2n group adds (column-major suffix scan)
+ one n-index permutation gather + sort + boundary phases; with 16
windows (c=16) the add work alone bounds throughput at ~2e6 points/s,
gathers/sort push the practical ceiling to ~1e6/s — measured 2^20
throughput should sit within ~2x of that.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 1.0e6


def run_msm(log_n: int, c: int, reps: int):
    import jax
    import jax.numpy as jnp
    from legosnark_tpu.curve import bn254
    from legosnark_tpu.curve.group import G1, g1_generator, Point
    from legosnark_tpu.curve import msm as msm_mod
    from legosnark_tpu.fields import limb as fl

    from legosnark_tpu.utils import rand as lrand

    FR = bn254.FR
    n = 1 << log_n
    rng = np.random.default_rng(0)

    # DISTINCT random scalars and points (round-4 verdict weak #6: the
    # old 64-value tiling gave the digit sorts and transport gathers
    # unrealistically repetitive keys). Scalars: vectorized 253-bit limb
    # sampling; points: one fixed-base batch exponentiation of a second
    # distinct scalar vector.
    scalars = jnp.asarray(lrand.rand_fr_limbs_fast(rng, n))    # [L, n]
    ks = jnp.asarray(lrand.rand_fr_limbs_fast(rng, n))
    table = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    points = msm_mod.batch_scalar_mul(G1, table, ks, c=8)
    # affine bases, like libff's multi_exp_with_mixed_addition operates on
    from legosnark_tpu.curve.group import to_affine_batch
    points = jax.jit(lambda p: to_affine_batch(G1, p))(points)
    jax.block_until_ready(points.x)

    fn = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, c=c,
                                          points_affine=True))
    t0 = time.perf_counter()
    # DOUBLE warmup with forced host sync: on the tunneled TPU platform
    # block_until_ready spuriously returns early on the first
    # post-compile execution, which would let the timing loop overlap
    # it and report nonsense throughputs
    for _ in range(2):
        out = fn(points, scalars)
        np.asarray(out.x)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(points, scalars)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return n / dt, compile_s


def main():
    quick = "--quick" in sys.argv

    import legosnark_tpu.config  # noqa: F401  (compile cache)

    if quick:
        configs = [(8, 6, 2)]
    else:
        configs = [(18, 16, 3), (20, 16, 3)]

    results = {}
    for log_n, c, reps in configs:
        try:
            pps, compile_s = run_msm(log_n, c, reps)
            results[log_n] = pps
            print(json.dumps({
                "metric": f"g1_msm_points_per_sec_2e{log_n}",
                "value": round(pps, 1),
                "unit": "points/sec",
                "compile_s": round(compile_s, 1),
                "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 4),
            }), flush=True)
        except Exception as e:  # keep going; report what we have
            print(json.dumps({"metric": f"g1_msm_2e{log_n}_error",
                              "value": 0, "unit": "error",
                              "detail": str(e)[:200]}), flush=True)

    # final line = the headline metric (largest size that ran)
    if results:
        top = max(results)
        print(json.dumps({
            "metric": f"g1_msm_points_per_sec_2e{top}",
            "value": round(results[top], 1),
            "unit": "points/sec",
            "vs_baseline": round(results[top] / BASELINE_POINTS_PER_SEC, 4),
        }))
    else:
        print(json.dumps({"metric": "g1_msm_points_per_sec", "value": 0,
                          "unit": "points/sec", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
