"""Runtime configuration for the framework.

The reference's config surface is compile-time CMake flags
(`/root/reference/CMakeLists.txt:11-102`: CURVE, MULTICORE, VERBOSE...)
plus argv sizes. Here it is a plain module: JAX persistent compilation
cache (the 254-bit limb graphs are expensive to compile — cache them
across processes), default MSM window sizes, and mesh helpers.
"""
from __future__ import annotations

import os

import jax


def setup_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    path = path or os.environ.get(
        "LEGOSNARK_CACHE", os.path.expanduser("~/.cache/legosnark_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # default persistent caching skips the CPU backend; tests run on
        # a virtual CPU mesh, so opt everything in
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # older jax without these options


setup_cache()

# Default Pippenger window size (bits) by MSM size; tuned on TPU v5e.
# Large sizes use c=16 (16 windows for 254-bit scalars): the 2^16
# bucket-boundary gather+tree costs ~n/16 adds per window at 2^20,
# well under the 20% scan/sort work saved vs c=13.
def default_window(n: int) -> int:
    if n <= (1 << 10):
        return 8
    if n <= (1 << 16):
        return 10
    if n <= (1 << 17):
        # measured on v5e at 2^17: c=13 782k pps vs c=16 701k pps —
        # the 2^16-1 bucket-boundary gather+tree amortizes only from
        # ~2^18 up (round-4 advisor follow-up)
        return 13
    # signed-digit recoding (msm._signed_digits) makes c=17 cost the
    # boundary phase of an unsigned c=16 window with one window fewer
    # (15 vs 16 for 254-bit scalars)
    return 17
