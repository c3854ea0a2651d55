"""Checkpoint schema versioning + cross-precision (bf16 <-> f32) restore."""

import json
import os

import flax.serialization
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.train.checkpoint import (
    SCHEMA_VERSION,
    CheckpointManager,
    load_model,
    save_model,
)


def _params(dtype):
    return {
        "dense": {
            "kernel": jnp.arange(12, dtype=dtype).reshape(3, 4) / 7,
            "bias": jnp.ones((4,), dtype),
        }
    }


def test_save_model_embeds_schema_version(tmp_path):
    path = str(tmp_path / "model.msgpack")
    save_model(path, _params(jnp.float32))
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    assert int(raw["schema"]) == SCHEMA_VERSION


def test_load_model_cross_precision_bf16_to_f32(tmp_path):
    path = str(tmp_path / "model.msgpack")
    save_model(path, _params(jnp.bfloat16))
    params, _ = load_model(path, _params(jnp.float32))
    assert params["dense"]["kernel"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(params["dense"]["kernel"], np.float32),
        np.asarray(_params(jnp.bfloat16)["dense"]["kernel"], np.float32),
    )


def test_load_model_cross_precision_f32_to_bf16(tmp_path):
    path = str(tmp_path / "model.msgpack")
    save_model(path, _params(jnp.float32))
    params, _ = load_model(path, _params(jnp.bfloat16))
    assert params["dense"]["kernel"].dtype == jnp.bfloat16


def test_load_model_reads_legacy_v1_payload(tmp_path):
    # round-1 format: no schema field
    path = str(tmp_path / "model.msgpack")
    legacy = {"params": _params(jnp.float32), "batch_stats": {}}
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(legacy))
    params, stats = load_model(path, _params(jnp.float32))
    assert params["dense"]["kernel"].shape == (3, 4)


def test_load_model_rejects_future_schema(tmp_path):
    path = str(tmp_path / "model.msgpack")
    payload = {
        "schema": np.int32(SCHEMA_VERSION + 5),
        "params": _params(jnp.float32),
        "batch_stats": {},
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    with pytest.raises(ValueError, match="schema"):
        load_model(path, _params(jnp.float32))


def test_manager_writes_sidecar_and_restores_cross_precision(tmp_path):
    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d, max_to_keep=2)
    state = {"params": _params(jnp.bfloat16), "epoch": 3}
    mgr.save(1, state)
    mgr.close()
    with open(os.path.join(d, "schema.json")) as f:
        assert json.load(f)["schema_version"] == SCHEMA_VERSION

    mgr2 = CheckpointManager(d)
    restored = mgr2.restore({"params": _params(jnp.float32), "epoch": 0})
    mgr2.close()
    assert restored["params"]["dense"]["kernel"].dtype == jnp.float32
    assert int(restored["epoch"]) == 3
    np.testing.assert_allclose(
        np.asarray(restored["params"]["dense"]["bias"], np.float32),
        np.ones((4,), np.float32),
    )


def test_manager_restores_v1_dir_without_sidecar(tmp_path):
    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d)
    mgr.save(1, {"params": _params(jnp.float32), "epoch": 1})
    mgr.close()
    os.remove(os.path.join(d, "schema.json"))  # simulate a round-1 dir
    mgr2 = CheckpointManager(d)
    restored = mgr2.restore({"params": _params(jnp.float32), "epoch": 0})
    mgr2.close()
    assert int(restored["epoch"]) == 1


def test_manager_rejects_future_sidecar(tmp_path):
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    with open(os.path.join(d, "schema.json"), "w") as f:
        json.dump({"schema_version": SCHEMA_VERSION + 1}, f)
    with pytest.raises(ValueError, match="schema"):
        CheckpointManager(d)
