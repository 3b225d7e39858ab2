"""Phase-timing / benchmark subsystem.

TPU-native equivalent of `TimeDelta`/`Benchmark`/`Benchmarkable`
(`/root/reference/src/utils/benchmark.{h,cc}`): a registry of named
phase timings keyed by (object id, session id), a mixin-style context
manager that brackets phases (`startBenchmark`/`stopBenchmark`), slave
propagation so sub-gadget timings land in the parent registry
(`benchmark.h:234-252`), cross-object relabeling (`applyBenchmarkFrom`,
`benchmark.h:285-299`), and run-and-average helpers
(`benchmark.h:42-58,182-232`).

TPU specifics: every timed region is fenced with
`jax.block_until_ready` on the values produced inside it — otherwise
async dispatch would attribute device time to the wrong phase — and a
`trace` hook emits `jax.profiler` ranges when enabled.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


def _fence(value: Any) -> Any:
    if value is not None:
        jax.block_until_ready(value)
    return value


class Benchmark:
    """Timing registry: micros keyed by objId -> session -> phase
    (`benchmark.h:86-170`)."""

    def __init__(self):
        self.timings: Dict[str, Dict[str, float]] = defaultdict(dict)

    def record(self, obj_id: str, phase: str, micros: float) -> None:
        self.timings[obj_id][phase] = micros

    def get(self, obj_id: str, phase: str) -> float:
        return self.timings[obj_id][phase]

    def copy_timing(self, src_obj: str, src_phase: str, dst_obj: str,
                    dst_phase: str) -> None:
        """`applyBenchmarkFrom` (`benchmark.h:285-299`)."""
        self.record(dst_obj, dst_phase, self.get(src_obj, src_phase))


class Benchmarkable:
    """Mixin: phase bracketing + slave registry sharing
    (`benchmark.h:234-299`)."""

    def __init__(self, obj_id: str, benchmark: Optional[Benchmark] = None):
        self.obj_id = obj_id
        self.benchmark = benchmark or Benchmark()
        self._starts: Dict[str, float] = {}

    def add_benchmark_slave(self, slave: "Benchmarkable",
                            label: str = "") -> None:
        """Child gadgets write into the parent's registry
        (`addBenchmarkSlave`, `benchmark.h:239-252`)."""
        slave.set_benchmark(self.benchmark)

    def set_benchmark(self, bm: Benchmark) -> None:
        self.benchmark = bm

    def start_benchmark(self, phase: str) -> None:
        self._starts[phase] = time.perf_counter()

    def stop_benchmark(self, phase: str, fence: Any = None) -> float:
        _fence(fence)
        micros = (time.perf_counter() - self._starts.pop(phase)) * 1e6
        self.benchmark.record(self.obj_id, phase, micros)
        return micros

    @contextlib.contextmanager
    def phase(self, name: str, trace: bool = False):
        """Context-manager phase; fences whatever the body registers
        via `out.append(...)` on the yielded list."""
        out: list = []
        ctx = (jax.profiler.TraceAnnotation(name) if trace
               else contextlib.nullcontext())
        with ctx:
            self.start_benchmark(name)
            yield out
            self.stop_benchmark(name, out)

    def timing_micros(self, phase: str) -> float:
        return self.benchmark.get(self.obj_id, phase)

    def apply_benchmark_from(self, other: "Benchmarkable", src_phase: str,
                             dst_phase: str) -> None:
        self.benchmark.record(
            self.obj_id, dst_phase,
            other.benchmark.get(other.obj_id, src_phase))


def time_function(fn, *args, fence: bool = True, **kwargs):
    """`TimeDelta::timeFunction` (`benchmark.h:42-50`): returns
    (result, micros), fencing device work."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if fence:
        _fence(out)
    return out, (time.perf_counter() - t0) * 1e6


def run_and_average(fn, *args, n: int = 3, **kwargs):
    """`runAndAverage` (`benchmark.h:52-58`): mean micros over n runs
    (first run may include compilation; callers warm up separately)."""
    total = 0.0
    out = None
    for _ in range(n):
        out, micros = time_function(fn, *args, **kwargs)
        total += micros
    return out, total / n


def fmt_time(micros: float) -> str:
    """`fmt_time` (`benchmark.cc:3-6`)."""
    return f"{micros:.0f} us ({micros / 1e6:.3f} s)"


def print_bm(tag: str, micros: float) -> None:
    """Grep-able `##`-tagged line (`benchmark.cc:8-25`)."""
    print(f"## {tag}: {fmt_time(micros)}")


def now() -> float:
    """Monotonic seconds (for ad-hoc compile-time accounting)."""
    return time.perf_counter()
