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

Both tiers are **schema-versioned** (``SCHEMA_VERSION``): snapshots embed
the version they were written with, checkpoint directories carry a
``schema.json`` sidecar, and loading an unknown-future version fails with a
clear error instead of a silent mis-restore. Version history:

- v1 (round 1): raw ``{"params", "batch_stats"}`` msgpack payload / bare
  Orbax directory — still readable (treated as v1 on load).
- v2: versioned payload + sidecar; cross-precision restore (a checkpoint
  written from a bf16 run restores into an f32 template and vice versa —
  leaves are cast to the template's dtype).
- v3: GAN checkpoints carry a fixed-shape ``"mid"`` subtree (mid-epoch
  preemption: batches completed into the epoch + the epoch's partial
  metric accumulators), and checkpoint steps are numbered
  ``epoch * MID_EPOCH_STRIDE + batch`` so a mid-epoch snapshot sorts
  between its epoch's start and completion. v2 directories restore with
  a zeroed ``mid`` (epoch-boundary semantics).
"""

from __future__ import annotations

import json
import os
from typing import Any

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

SCHEMA_VERSION = 3
_SIDECAR = "schema.json"

# checkpoint step numbering: epoch e, b batches in => e * STRIDE + b.
# The completion of epoch e is the start of epoch e+1 => (e+1) * STRIDE,
# which sorts above any mid-epoch snapshot of epoch e.
MID_EPOCH_STRIDE = 100_000


def ckpt_step(epoch: int, batch: int = 0) -> int:
    """Orbax step id for a snapshot taken ``batch`` batches into ``epoch``
    (``batch=0`` = at the epoch's start == the previous epoch's end)."""
    assert 0 <= batch < MID_EPOCH_STRIDE
    return epoch * MID_EPOCH_STRIDE + batch


def empty_mid() -> dict:
    """The v3 ``mid`` subtree, zeroed (= an epoch-boundary checkpoint).

    Fixed structure so every save/restore template matches: ``batch`` is
    the number of train batches already consumed in the epoch being
    resumed (0 = start fresh at ``epoch + 1``), the 2-vectors are the
    partial (numerator, denominator) metric accumulators of that epoch.
    """
    return {
        "batch": np.int64(0),
        "mse": np.zeros(2, np.float64),
        "fd_acc": np.zeros(2, np.float64),
        "td_acc": np.zeros(2, np.float64),
    }


def _cast_like(template: Any, restored: Any) -> Any:
    """Cast restored leaves to the template's dtypes (cross-precision
    restore: bf16 <-> f32)."""

    def cast(t, r):
        if hasattr(t, "dtype") and hasattr(r, "dtype") and t.dtype != r.dtype:
            return jnp.asarray(r, t.dtype) if isinstance(
                r, jax.Array
            ) else np.asarray(r, t.dtype)
        return r

    return jax.tree_util.tree_map(cast, template, restored)


def _check_version(version: int, where: str):
    if version > SCHEMA_VERSION:
        raise ValueError(
            f"{where} was written with checkpoint schema v{version}, but "
            f"this build only understands <= v{SCHEMA_VERSION}. Upgrade the "
            "framework to restore it."
        )


# --------------------------------------------------------------- model-only
def save_model(path: str, params, batch_stats=None):
    payload = {
        "schema": np.int32(SCHEMA_VERSION),
        "params": params,
        "batch_stats": batch_stats or {},
    }
    data = flax.serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_model(path: str, template_params, template_batch_stats=None):
    with open(path, "rb") as f:
        data = f.read()
    raw = flax.serialization.msgpack_restore(data)
    version = int(raw.pop("schema", 1))  # v1 payloads carry no field
    _check_version(version, path)
    template = {
        "params": template_params,
        "batch_stats": template_batch_stats or {},
    }
    restored = flax.serialization.from_state_dict(template, raw)
    restored = _cast_like(template, restored)
    return restored["params"], restored["batch_stats"]


# ------------------------------------------------------------- full state
class CheckpointManager:
    """Orbax full-train-state checkpointing with keep-N rotation."""

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._check_sidecar()
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def _sidecar_path(self) -> str:
        return os.path.join(self._dir, _SIDECAR)

    def _check_sidecar(self):
        _check_version(self.sidecar_version(), self._dir)

    def sidecar_version(self) -> int:
        """Schema version the directory was last written with (1 if no
        sidecar — a bare/legacy Orbax directory)."""
        path = self._sidecar_path()
        if not os.path.exists(path):
            return 1
        with open(path) as f:
            return int(json.load(f).get("schema_version", 1))

    def _write_sidecar(self):
        with open(self._sidecar_path(), "w") as f:
            json.dump(
                {"schema_version": SCHEMA_VERSION, "format": "orbax-standard"},
                f,
            )

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        self._write_sidecar()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None):
        """Restore ``step`` (default latest) into ``template``'s structure.

        Leaves are cast to the template's dtypes, so an f32 template
        restores a bf16-run checkpoint (and vice versa) — resuming a run
        under a different ``--precision`` than it was saved with.
        """
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        self._check_sidecar()
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype")
            else x,
            template,
        )
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        return _cast_like(template, restored)

    def close(self):
        self._mgr.close()


def gan_restore_template(mgr: "CheckpointManager", states, key_state):
    """Restore template for a GAN checkpoint directory, matching the
    schema version it was written with (v3 adds the ``mid`` subtree)."""
    template = {"states": states, "epoch": 0, "key": np.asarray(key_state)}
    if mgr.sidecar_version() >= 3:
        template["mid"] = empty_mid()
    return template


def setup_gan_checkpointing(
    out_dir: str,
    *,
    resume: bool,
    save_epoch: int,
    states,
    keys,
    place,
    history,
):
    """Shared dcgan/cyclegan resume block.

    Creates the CheckpointManager (when checkpointing or resuming is
    requested) and restores the latest full GAN state, re-applying the
    mesh placement/TP sharding via ``place``. Single-sourced because the
    two drivers' hand-copied versions had already diverged once (the
    cyclegan copy forgot the TP re-shard on restore — round-2 review).

    Returns ``(ckpt_mgr, states, start_epoch, keys, history, mid)`` —
    ``mid`` is the v3 mid-epoch subtree (see :func:`empty_mid`): when
    ``mid["batch"] > 0`` the driver must REDO ``start_epoch`` from that
    batch index (skipping the consumed batches) instead of starting the
    next epoch.
    """
    from ..core.prng import KeySeq
    from ..utils.history import TrainingHistory

    start_epoch = 1
    ckpt_mgr = None
    mid = empty_mid()
    if out_dir and (resume or save_epoch):
        ckpt_mgr = CheckpointManager(
            os.path.join(out_dir, "checkpoints"), max_to_keep=2
        )
        if resume and ckpt_mgr.latest_step() is not None:
            template = gan_restore_template(ckpt_mgr, states, keys.state)
            restored = ckpt_mgr.restore(template)
            states = place(restored["states"])
            keys = KeySeq(jnp.asarray(restored["key"]))
            mid = restored.get("mid", empty_mid())
            mid = {k: np.asarray(v) for k, v in mid.items()}
            if int(mid["batch"]) > 0:
                start_epoch = int(restored["epoch"])  # redo, mid-way
                print(f"[resume] restored mid-epoch snapshot: epoch "
                      f"{start_epoch}, {int(mid['batch'])} batches done; "
                      f"continuing inside the epoch")
            else:
                start_epoch = int(restored["epoch"]) + 1
                print(f"[resume] restored epoch {start_epoch - 1}; "
                      f"continuing at {start_epoch}")
            hist_path = os.path.join(out_dir, "history.json")
            if os.path.exists(hist_path):
                history = TrainingHistory.from_json(
                    hist_path, save_path=history.save_path
                )
    return ckpt_mgr, states, start_epoch, keys, history, mid
