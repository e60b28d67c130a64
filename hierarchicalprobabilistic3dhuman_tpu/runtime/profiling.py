"""Profiling / tracing hooks (absent in the reference — SURVEY §5).

Thin wrappers over jax.profiler so drivers can expose a --profile_dir flag:
traces open in TensorBoard / Perfetto and capture XLA HLO + TPU hardware
counters.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(profile_dir):
    """Capture a jax.profiler trace for the enclosed block (no-op if dir None)."""
    if profile_dir is None:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Lightweight per-stage wall-clock accumulator for driver loops."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_s": round(self.totals[name] / self.counts[name], 4)}
                for name in self.totals}
