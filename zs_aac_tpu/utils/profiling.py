"""Tracing / profiling as first-class utilities.

The reference has no profiling beyond ad-hoc ``time.time()`` deltas
(``/root/reference/retrieval/pretrain.py:35,58``; SURVEY.md §5). This module
exposes the TPU-native tools:

- ``trace(logdir)``: a context manager around ``jax.profiler`` producing
  XPlane traces viewable in TensorBoard/Perfetto.
- ``annotate(name)``: a ``TraceAnnotation`` so train-step phases show up in
  the trace timeline.
- ``StepTimer``: wall-clock step timing with warmup skipping and percentile
  summaries — remote-transport-safe when used around host-synchronized
  steps.
- ``device_memory_stats()``: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

__all__ = ["trace", "annotate", "StepTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Step wall-clock stats: ``with timer.step(): ...`` then ``summary()``."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: List[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def device_memory_stats(device=None) -> Optional[dict]:
    """Live HBM stats for a device (None on backends without support)."""
    import jax

    d = device or jax.devices()[0]
    try:
        return d.memory_stats()
    except Exception:
        return None
