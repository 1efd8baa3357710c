"""Profiling and throughput instrumentation.

TPU-native replacement for the reference's hand-rolled wall-clock phase
timers (reference solvers.py:140-146,299-314): a context manager around
``jax.profiler`` for device traces, plus throughput counters (nnz/s,
iterations/s) computed from solve metadata.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Wall-clock phase timer with the reference's timings-dict shape."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.marks = {}

    def mark(self, name: str):
        self.marks[name] = time.perf_counter() - self.t0
        return self.marks[name]


def spmv_throughput(nnz: int, seconds: float) -> float:
    return nnz / seconds if seconds > 0 else float("inf")


def solve_throughput(info: dict, nnz: int, seconds: float) -> dict:
    """Counters for a Krylov solve: per-iteration cost and effective nnz/s
    (each iteration reads the operator at least twice: SpMV + true
    residual)."""
    steps = max(info.get("steps", 0), 1)
    return {
        "iterations_per_s": steps / seconds,
        "spmv_nnz_per_s": 2 * steps * nnz / seconds,
        "seconds_per_iteration": seconds / steps,
    }
