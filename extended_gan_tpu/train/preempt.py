"""Preemption-safe training: snapshot-on-SIGTERM.

Production TPU pods are preemptible — the scheduler delivers SIGTERM with
a grace window before the hard kill. The reference loses everything except
the best-val ``model.pt`` on any interruption
(``/root/reference/convolutional_gat/train.py:151-155`` is save-only; the
GAN trainers save nothing — SURVEY §5 "failure detection: none").

Here every driver polls a :class:`GracefulShutdown` after EVERY training
step: a caught SIGTERM stops the epoch mid-way and writes a FULL
resumable checkpoint (params, opt state, PRNG stream, epoch, scheduler,
plus the v3 ``mid`` subtree: batches consumed into the epoch + the
epoch's partial metric accumulators); ``--resume`` rebuilds the epoch's
loader, replay-skips the consumed batches (identical RNG draws), and
continues BIT-IDENTICALLY to an uninterrupted run
(tests/test_preempt.py's mid-epoch cases assert exact history and
parameter equality). The grace window therefore needs to cover one
training step plus one Orbax save — not an epoch tail.

The handler only installs from the main thread (signal.signal raises
elsewhere); off-main-thread use degrades to a never-requested no-op, which
keeps the drivers usable from worker threads and tests.
"""

from __future__ import annotations

import signal


class GracefulShutdown:
    """Context manager that converts SIGTERM into a polled flag."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = signals
        self._prev: dict = {}
        self.requested = False

    def _handler(self, signum, frame):
        print(f"[preempt] caught signal {signum}; checkpointing and "
              f"exiting at the next epoch boundary")
        self.requested = True

    def __enter__(self) -> "GracefulShutdown":
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:
                pass  # not the main thread: flag simply never sets
        return self

    def __exit__(self, *exc) -> bool:
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        return False
