"""Lightning-style training-module abstraction.

The reference sketches (but never finishes) a PyTorch-Lightning module
wrapping G + both discriminators with three Adams
(/root/reference/cycle_gan/models/lightning_model.py:7-32:
``configure_optimizers`` only, no steps). This is the finished, functional
equivalent: a :class:`TrainModule` declares models, optimizers, and a
jit-compilable ``training_step``; :class:`Trainer` compiles the step once
and drives epochs with sharded batches.

Unlike Lightning, state is explicit (a pytree), the whole step is one XLA
program, and the same module runs unchanged on 1 chip or a full mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import numpy as np

from ..core import KeySeq
from ..parallel import MeshContext


class TrainModule:
    """Subclass and implement:

    - ``configure(rng) -> state``            (build models + optimizer state)
    - ``training_step(state, batch, rng) -> (state, logs)``  (pure, jittable)
    - optionally ``validation_step(state, batch) -> logs``    (pure, jittable)
    """

    def configure(self, rng) -> Any:
        raise NotImplementedError

    def training_step(self, state, batch, rng):
        raise NotImplementedError

    def validation_step(self, state, batch):
        return {}


class Trainer:
    def __init__(
        self,
        *,
        mesh: MeshContext | None = None,
        seed: int = 369,
        log_every: int = 50,
        max_batches: int = 0,
    ):
        self.mesh = mesh or MeshContext.create()
        self.keys = KeySeq(seed)
        self.log_every = log_every
        self.max_batches = max_batches

    def fit(
        self,
        module: TrainModule,
        train_data: Callable[[], Iterable],
        val_data: Callable[[], Iterable] | None = None,
        *,
        epochs: int = 1,
        state=None,
    ):
        if state is None:
            state = module.configure(self.keys.next())
        state = self.mesh.put_replicated(state)
        step = jax.jit(module.training_step, donate_argnums=(0,))
        val_step = jax.jit(module.validation_step)
        history = []
        for epoch in range(1, epochs + 1):
            for i, batch in enumerate(train_data()):
                if self.max_batches and i >= self.max_batches:
                    break
                batch = self.mesh.put_batch(*batch)
                state, logs = step(state, batch, self.keys.next())
                if i % self.log_every == 0:
                    msg = "\t".join(
                        f"{k}: {float(v):.4f}" for k, v in logs.items()
                    )
                    print(f"[epoch {epoch}] {msg}")
            epoch_logs = {}
            if val_data is not None:
                accs: dict[str, list] = {}
                for batch in val_data():
                    batch = self.mesh.put_batch(*batch)
                    for k, v in val_step(state, batch).items():
                        accs.setdefault(k, []).append(np.asarray(v))
                epoch_logs = {k: float(np.mean(v)) for k, v in accs.items()}
            history.append(epoch_logs)
        return state, history
