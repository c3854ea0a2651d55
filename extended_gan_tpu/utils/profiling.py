"""Tracing / profiling hooks.

The reference's only timing is a mislabelled eval wall-clock
(compare_models/__main__.py:28-31, SURVEY.md section 5). Here:

- :class:`StepTimer` — streaming per-step wall-clock stats (mean/p50/p90),
- :func:`trace` — context manager around ``jax.profiler`` so any training
  region can be captured for TensorBoard/XProf/perfetto,
- :func:`annotate` — named trace annotations inside a step.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0: float | None = None
        self._seen = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)

    def stats(self) -> dict[str, float]:
        if not self._times:
            return {}
        a = np.asarray(self._times)
        return {
            "steps": len(a),
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "steps_per_sec": float(1.0 / a.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
