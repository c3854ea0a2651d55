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


def test_manager_ignores_interrupted_save(tmp_path):
    """Crash consistency: a power loss mid-save leaves an UNCOMMITTED
    ``<step>.orbax-checkpoint-tmp-*`` directory (Orbax commits via atomic
    rename). Reopening the directory must fall back to the last committed
    step — not fail, and not restore partial state."""
    import shutil

    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d, max_to_keep=3)
    mgr.save(1, {"params": _params(jnp.float32), "epoch": 1})
    mgr.save(2, {"params": _params(jnp.float32), "epoch": 2})
    mgr.close()
    # simulate a crash during the step-3 save: committed-step-2 payload
    # copied under an uncommitted tmp name
    shutil.copytree(os.path.join(d, "2"),
                    os.path.join(d, "3.orbax-checkpoint-tmp-1755474000"))

    mgr2 = CheckpointManager(d)
    assert mgr2.latest_step() == 2
    restored = mgr2.restore({"params": _params(jnp.float32), "epoch": 0})
    assert int(restored["epoch"]) == 2
    # recovery continues cleanly: the next save commits and becomes latest
    mgr2.save(3, {"params": _params(jnp.float32), "epoch": 3})
    assert mgr2.latest_step() == 3
    mgr2.close()


def test_manager_rejects_future_sidecar(tmp_path):
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    with open(os.path.join(d, "schema.json"), "w") as f:
        json.dump({"schema_version": SCHEMA_VERSION + 1}, f)
    with pytest.raises(ValueError, match="schema"):
        CheckpointManager(d)


def test_ckpt_step_ordering():
    """v3 step numbering: a mid-epoch snapshot sorts between its epoch's
    start and completion; completions sort by epoch."""
    from extended_gan_tpu.train.checkpoint import MID_EPOCH_STRIDE, ckpt_step

    e2_start = ckpt_step(2, 0)
    e2_mid = ckpt_step(2, 17)
    e2_done = ckpt_step(3, 0)  # completion of epoch 2 == start of epoch 3
    assert e2_start < e2_mid < e2_done
    assert ckpt_step(1, MID_EPOCH_STRIDE - 1) < ckpt_step(2, 0)


def test_empty_mid_structure_is_fixed():
    """The v3 mid subtree must keep a FIXED structure (templates match
    every save), and zeroed means epoch-boundary semantics."""
    import numpy as np

    from extended_gan_tpu.train.checkpoint import empty_mid

    a, b = empty_mid(), empty_mid()
    assert sorted(a) == ["batch", "fd_acc", "mse", "td_acc"]
    assert int(a["batch"]) == 0
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_gan_restore_template_matches_sidecar_version(tmp_path):
    """v2 directories restore WITHOUT a mid subtree; v3+ with one."""
    import json
    import os

    from extended_gan_tpu.train.checkpoint import (
        CheckpointManager,
        gan_restore_template,
    )

    d = tmp_path / "ckpt"
    mgr = CheckpointManager(str(d))
    # fresh dir: no sidecar until the first save -> treated as v1/legacy
    t = gan_restore_template(mgr, {"w": 0}, np.zeros(2, np.uint32))
    assert "mid" not in t
    with open(os.path.join(str(d), "schema.json"), "w") as f:
        json.dump({"schema_version": 3}, f)
    t = gan_restore_template(mgr, {"w": 0}, np.zeros(2, np.uint32))
    assert "mid" in t
    mgr.close()
