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


class EpochProfiler:
    """Per-epoch throughput profiler for the training drivers (`--profile`).

    Two measurements that do NOT perturb the async dispatch pipeline:

    - per-step host dispatch time (:class:`StepTimer` around the ``step()``
      call — the fused programs return immediately, so this is host-side
      enqueue cost, not device time),
    - whole-epoch wall time including the single epoch-end device fetch,
      which syncs the stream — honest pipelined ``steps_per_sec``.

    With ``trace_dir`` set, the FIRST profiled epoch is additionally
    captured with ``jax.profiler`` for TensorBoard/XProf/perfetto.
    """

    def __init__(self, trace_dir: str = ""):
        self.trace_dir = trace_dir
        self._epoch_idx = 0
        self._timer = StepTimer(warmup=2)
        self._t0: float | None = None
        self._tracing = False

    def start_epoch(self):
        self._timer = StepTimer(warmup=2)
        self._t0 = time.perf_counter()
        if self.trace_dir and self._epoch_idx == 0:
            import jax

            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True

    def step(self) -> StepTimer:
        """Context manager wrapping one train-step dispatch."""
        return self._timer

    def end_epoch(self) -> dict[str, float]:
        wall = time.perf_counter() - self._t0 if self._t0 is not None else 0.0
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False
            print(f"[profile] jax trace written to {self.trace_dir}")
        self._epoch_idx += 1
        n = self._timer._seen
        out: dict[str, float] = {
            "epoch_wall_s": round(wall, 6),
            "profiled_steps": float(n),
        }
        if n and wall > 0:
            out["steps_per_sec"] = round(n / wall, 3)
        d = self._timer.stats()
        if d:
            out["dispatch_mean_s"] = round(d["mean_s"], 6)
            out["dispatch_p90_s"] = round(d["p90_s"], 6)
        return out


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


def step_context(profiler: "EpochProfiler | None"):
    """Per-step timing context factory shared by the three drivers.

    Returns a zero-arg callable: ``profiler.step`` when profiling, else a
    no-op context. Build it ONCE per epoch loop and call it each step —
    keeps the hot loop branch-free.
    """
    if profiler is not None:
        return profiler.step
    return contextlib.nullcontext
