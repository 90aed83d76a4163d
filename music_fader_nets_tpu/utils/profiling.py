"""Profiling helpers.

The reference has no tracing at all (tqdm bars only, SURVEY.md §5). These
wrap `jax.profiler` for XLA/TPU traces viewable in TensorBoard/Perfetto,
plus a host-side step timer whose sync is a *host read* — on the tunneled
TPU platform here `block_until_ready` returns before execution finishes
(see .claude/skills/verify/SKILL.md), so naive timers lie.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def xla_trace(log_dir: str = "log/trace"):
    """Capture an XLA profiler trace around a block:
        with xla_trace(): trainer.run_epoch(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates host-observed step durations; `sync_value` must be a
    device scalar whose host read forces completion of the timed work."""

    def __init__(self):
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            float(np.asarray(sync_value).ravel()[0])
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        t = np.asarray(self.times)
        if len(t) == 0:
            return {}
        return {"mean_s": float(t.mean()), "p50_s": float(np.median(t)),
                "p90_s": float(np.percentile(t, 90)), "n": len(t)}
