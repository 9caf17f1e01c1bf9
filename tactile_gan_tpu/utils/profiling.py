"""Tracing / profiling hooks.

The reference's only observability is per-epoch wall-clock prints
(/root/reference/train.py:96,175-180). TPU-native equivalents:

- ``trace(logdir)``: context manager around jax.profiler.trace — dumps an
  xplane trace of the jitted step for xprof/tensorboard.
- ``StepTimer``: cheap host-side per-step timing with p50/p90 summaries
  (device work measured by blocking on the step output).
- ``nan_guard``: raises on non-finite losses (the functional analogue of a
  sanitizer; enable jax_debug_nans for compiled-op granularity).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.durations: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.durations.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "steps": int(d.size),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
        }


def nan_guard(metrics_dict: Dict[str, float], step_info: str = "") -> None:
    bad = {k: v for k, v in metrics_dict.items() if not np.isfinite(v)}
    if bad:
        raise FloatingPointError(
            f"non-finite losses {bad} {step_info} — enable --debug_nans for "
            "op-level localization")
