"""Benchmark entry: G1 MSM throughput (the north-star metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Default run targets real TPU (driver invocation); `--quick` runs a
small CPU-safe configuration.

vs_baseline: ratio against the reference's CPU Pippenger throughput.
The reference publishes no numbers (BASELINE.md), so the baseline
constant is the measured order of magnitude of libff's OpenMP
`multiExpMA` on a multicore server CPU for 2^20 points (~1e6
points/sec) — documented here as the comparison anchor until the
driver produces a measured reference number.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 1.0e6


def main():
    quick = "--quick" in sys.argv

    import jax
    import jax.numpy as jnp
    import legosnark_tpu.config  # noqa: F401
    from legosnark_tpu.curve import bn254
    from legosnark_tpu.curve.group import G1, g1_generator, Point
    from legosnark_tpu.curve import msm as msm_mod
    from legosnark_tpu.fields import limb as fl

    FR = bn254.FR
    if quick:
        log_n, c, reps = 8, 6, 2
    else:
        log_n, c, reps = 18, 13, 3
    n = 1 << log_n

    rng = np.random.default_rng(0)
    # scalars via vectorized limb decomposition (host)
    raw = rng.integers(0, 1 << 62, size=(n, 5), dtype=np.uint64)
    vals = [int(r[0]) + (int(r[1]) << 60) + (int(r[2]) << 120)
            + (int(r[3]) << 180) + (int(r[4]) << 240) for r in raw[:64]]
    # build a [64] base block and tile it (scalar variety does not
    # change MSM cost; keeps host-side bigint prep O(64))
    block = np.stack([fl.int_to_limbs(v % bn254.R, FR.nlimbs) for v in vals])
    scalars = jnp.asarray(np.tile(block, (n // 64, 1)))

    base = g1_generator()
    # n distinct points: k*G for k = 1..64 tiled (point variety does not
    # change cost either; avoids an n-point host precompute)
    ks = jnp.asarray(np.stack(
        [fl.int_to_limbs(k + 1, FR.nlimbs) for k in range(64)]))
    pts64 = G1.scalar_mul(
        Point(jnp.broadcast_to(base.x, (64,) + base.x.shape),
              jnp.broadcast_to(base.y, (64,) + base.y.shape),
              jnp.broadcast_to(base.z, (64,) + base.z.shape)), ks)
    points = Point(
        jnp.tile(pts64.x, (n // 64, 1)),
        jnp.tile(pts64.y, (n // 64, 1)),
        jnp.tile(pts64.z, (n // 64, 1)))

    fn = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, c=c))
    out = fn(points, scalars)
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(points, scalars)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    pps = n / dt
    print(json.dumps({
        "metric": f"g1_msm_points_per_sec_2e{log_n}",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
