"""Test configuration: force a deterministic 8-device CPU mesh.

Multi-chip logic is validated the standard JAX way (SURVEY §4): a
virtual CPU mesh via --xla_force_host_platform_device_count, no pod
required. Benchmarks (bench.py) run on real TPU instead.
"""
import os
import sys

# small Pippenger window: tests run tiny MSMs on CPU where the 2^c
# bucket-boundary phase would dominate at the TPU-tuned window sizes
os.environ.setdefault("LEGOSNARK_MSM_C", "4")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The image's sitecustomize pre-imports jax and pins JAX_PLATFORMS to
# the tunneled TPU backend, so env vars are too late — force CPU via
# jax.config (backends are not initialized yet at conftest time).
# LEGOSNARK_TEST_TPU=1 keeps the real TPU backend instead — used for
# the recorded slow-tier run (pairing compiles are minutes on TPU vs
# hours on this 2-CPU host). The virtual 8-device mesh tests
# (test_sharded) are NOT in the slow tier; run them without this flag.
import jax  # noqa: E402

if os.environ.get("LEGOSNARK_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import legosnark_tpu.config  # noqa: E402,F401  (enables XLA compile cache)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: pairing-heavy round-trips; deselect with -m 'not slow' "
        "for the fast tier")
