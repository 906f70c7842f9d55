"""Tracing/profiling helpers — first-class step timing + device traces.

The reference has no profiling beyond wall-clock FPS prints
(`debug/FPS_test.py:48-55`, SURVEY §5); here ``jax.profiler`` traces and a
per-phase step timer are part of the framework.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulate wall-clock per named phase; blocks on device completion so
    timings are honest under async dispatch."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v * 1e3:.2f} ms" for k, v in sorted(self.summary().items())
        )
