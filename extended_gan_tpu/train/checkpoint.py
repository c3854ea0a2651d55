"""Checkpointing.

The reference only ever saves best-val model weights
(convolutional_gat/train.py:151-155) and has NO resume path — a crash loses
optimizer/scheduler/epoch state (SURVEY.md section 5). Two tiers here:

- :func:`save_model` / :func:`load_model` — weights-only snapshots
  (``model.msgpack``; the role the reference's ``model.pt`` plays for
  compare_models / create_plots),
- :class:`CheckpointManager` — Orbax-backed full train state (params, BN
  stats, optimizer moments, epoch counter, PRNG key) with resume, the
  failure-recovery subsystem the reference lacks.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax
import numpy as np


# --------------------------------------------------------------- model-only
def save_model(path: str, params, batch_stats=None):
    payload = {"params": params, "batch_stats": batch_stats or {}}
    data = flax.serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_model(path: str, template_params, template_batch_stats=None):
    with open(path, "rb") as f:
        data = f.read()
    payload = {
        "params": template_params,
        "batch_stats": template_batch_stats or {},
    }
    restored = flax.serialization.from_bytes(payload, data)
    return restored["params"], restored["batch_stats"]


# ------------------------------------------------------------- full state
class CheckpointManager:
    """Orbax full-train-state checkpointing with keep-N rotation."""

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype")
            else x,
            template,
        )
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )

    def close(self):
        self._mgr.close()
