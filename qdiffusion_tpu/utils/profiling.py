"""Tracing and per-step timing.

The reference's observability is wall-clock throughput lines only
(SURVEY §5). Here: jax.profiler device traces (viewable in TensorBoard /
Perfetto) plus a lightweight step timer that reports percentiles.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import List

import jax
import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace for everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", logdir)


class StepTimer:
    """Blocking per-step timer with percentile summary."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.times: List[float] = []

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    def time_fn(self, fn, *args, iters: int = 10, warmup: int = 2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            self.times.append(time.perf_counter() - t0)
        return self.summary()

    def summary(self) -> dict:
        arr = np.asarray(self.times)
        s = {"name": self.name, "n": len(arr), "mean_ms": float(arr.mean() * 1e3),
             "p50_ms": float(np.percentile(arr, 50) * 1e3),
             "p95_ms": float(np.percentile(arr, 95) * 1e3)}
        logger.info("%s: mean %.2fms p50 %.2fms p95 %.2fms (n=%d)",
                    s["name"], s["mean_ms"], s["p50_ms"], s["p95_ms"], s["n"])
        return s
