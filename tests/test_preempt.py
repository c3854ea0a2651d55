"""Preemption safety: SIGTERM mid-training => resumable checkpoint + clean
exit (the production grace-window contract; the reference loses all GAN
state on any interruption)."""

import os
import signal

import pytest


def test_graceful_shutdown_flag_and_restore():
    from extended_gan_tpu.train.preempt import GracefulShutdown

    before = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as s:
        assert not s.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert s.requested  # delivered synchronously to this thread
    assert signal.getsignal(signal.SIGTERM) is before


@pytest.mark.slow
def test_dcgan_sigterm_checkpoints_and_resumes(tmp_path, monkeypatch):
    """SIGTERM during epoch 2 of 4: the driver finishes the epoch, saves a
    full checkpoint (outside the --save-epoch cadence), and returns; a
    --resume run continues at epoch 3 and completes."""
    from extended_gan_tpu.train.checkpoint import CheckpointManager
    from extended_gan_tpu.train.dcgan_driver import train
    from extended_gan_tpu.utils.history import TrainingHistory

    calls = {"n": 0}
    orig_append = TrainingHistory.append

    def append_then_preempt(self, results):
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_append(self, results)

    monkeypatch.setattr(TrainingHistory, "append", append_then_preempt)

    out = str(tmp_path / "run")
    common = dict(
        epochs=4, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, seed=11, out_dir=out,
        params={"imsize": 64, "ngf": 8, "ndf": 8, "save_epoch": 10},
    )
    _, hist = train(**common)
    assert len(hist.history["train_mse"]) == 2, "did not stop after epoch 2"
    mgr = CheckpointManager(os.path.join(out, "checkpoints"))
    from extended_gan_tpu.train.checkpoint import ckpt_step

    # epoch-2 boundary snapshot = start of epoch 3 (v3 step numbering)
    assert mgr.latest_step() == ckpt_step(3), "preemption checkpoint missing"
    mgr.close()

    monkeypatch.setattr(TrainingHistory, "append", orig_append)
    _, hist2 = train(**common, resume=True)
    assert len(hist2.history["train_mse"]) == 4, "resume did not complete"


class _CountingShutdown:
    """GracefulShutdown stand-in whose flag turns True on the Nth read —
    deterministic mid-epoch preemption without real signal timing."""

    def __init__(self, fire_at_read: int):
        self._reads = 0
        self._fire_at = fire_at_read

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    @property
    def requested(self):
        self._reads += 1
        return self._reads >= self._fire_at


@pytest.mark.slow
def test_dcgan_mid_epoch_preempt_bit_identical_resume(tmp_path, monkeypatch):
    """Step-granular preemption (round-2 VERDICT item 5): a SIGTERM-style
    stop after batch 2 of epoch 2 snapshots states + PRNG stream + loader
    cursor + partial metric accumulators; the resumed run finishes epochs
    2-3 and its history AND final parameters are BIT-IDENTICAL to an
    uninterrupted run."""
    import jax
    import numpy as np

    from extended_gan_tpu.train import preempt
    from extended_gan_tpu.train.checkpoint import (
        MID_EPOCH_STRIDE,
        CheckpointManager,
    )
    from extended_gan_tpu.train.dcgan_driver import train

    common = dict(
        epochs=3, train_batch_size=8, test_batch_size=8, max_batches=4,
        synthetic=True, seed=23,
        params={"imsize": 64, "ngf": 8, "ndf": 8, "save_epoch": 10},
    )

    # ---- reference: uninterrupted
    s_ref, h_ref = train(**common, out_dir=str(tmp_path / "ref"))

    # ---- interrupted: flag fires on the 7th read = epoch-2 batch 2
    # (reads: e1 b1..b4 -> 1..4, e1 tail -> 5, e2 b1 -> 6, e2 b2 -> 7)
    real_shutdown = preempt.GracefulShutdown
    monkeypatch.setattr(
        preempt, "GracefulShutdown", lambda: _CountingShutdown(7))
    out = str(tmp_path / "run")
    _, h1 = train(**common, out_dir=out)
    assert len(h1.history["train_mse"]) == 1, "epoch 2 should be partial"
    mgr = CheckpointManager(os.path.join(out, "checkpoints"))
    step = mgr.latest_step()
    mgr.close()
    assert step == 2 * MID_EPOCH_STRIDE + 2, \
        f"expected a mid-epoch-2 snapshot at batch 2, got step {step}"

    # ---- resume with the real shutdown class: must complete and match
    monkeypatch.setattr(preempt, "GracefulShutdown", real_shutdown)
    s_res, h_res = train(**common, out_dir=out, resume=True)

    for key in h_ref.history:
        np.testing.assert_array_equal(
            np.asarray(h_ref.history[key]), np.asarray(h_res.history[key]),
            err_msg=f"history[{key}] diverged after mid-epoch resume")
    for net in ("g", "fd", "td"):
        ref_leaves = jax.tree_util.tree_leaves(getattr(s_ref, net).params)
        res_leaves = jax.tree_util.tree_leaves(getattr(s_res, net).params)
        for a, b in zip(ref_leaves, res_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gat_mid_epoch_preempt_bit_identical_resume(tmp_path, monkeypatch):
    """conv-GAT step-granular preemption: interrupt inside epoch 2, resume,
    and match the uninterrupted run's history + final params exactly."""
    import jax
    import numpy as np

    from extended_gan_tpu.train import preempt
    from extended_gan_tpu.train.checkpoint import MID_EPOCH_STRIDE
    from extended_gan_tpu.train.gat_driver import train

    common = dict(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        train_batch_size=8, test_batch_size=8, epochs=3, max_batches=4,
        learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(16, 16), dataset="synthetic", seed=31,
    )

    ref_dir = str(tmp_path / "ref")
    s_ref, h_ref = train(output_path=ref_dir, **common)

    # fire on the 7th requested-read = epoch-2 batch 2 (reads: e1 b1..b4,
    # e1 driver tail, e2 b1, e2 b2)
    real_shutdown = preempt.GracefulShutdown
    monkeypatch.setattr(
        preempt, "GracefulShutdown", lambda: _CountingShutdown(7))
    out = str(tmp_path / "run")
    _, h1 = train(output_path=out, resume=True, checkpoint_every=10,
                  **common)
    assert len(h1["val_loss"]) == 1, "epoch 2 should be partial"

    from extended_gan_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(out, "checkpoints"))
    assert mgr.latest_step() == 2 * MID_EPOCH_STRIDE + 2
    mgr.close()

    monkeypatch.setattr(preempt, "GracefulShutdown", real_shutdown)
    s_res, h_res = train(output_path=out, resume=True, checkpoint_every=10,
                         **common)

    for key in h_ref:
        np.testing.assert_array_equal(
            np.asarray(h_ref[key]), np.asarray(h_res[key]),
            err_msg=f"history[{key}] diverged after mid-epoch resume")
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cyclegan_mid_epoch_preempt_bit_identical_resume(tmp_path,
                                                         monkeypatch):
    """CycleGAN step-granular preemption: interrupt inside epoch 2,
    resume, match the uninterrupted run exactly (history + G_xy params)."""
    import jax
    import numpy as np

    from extended_gan_tpu.train import preempt
    from extended_gan_tpu.train.checkpoint import MID_EPOCH_STRIDE
    from extended_gan_tpu.train.cyclegan_driver import train

    common = dict(
        epochs=3, train_batch_size=8, test_batch_size=8, max_batches=4,
        imsize=64, ndf=8, synthetic=True, seed=29, save_epoch=10,
    )

    s_ref, h_ref = train(**common, out_dir=str(tmp_path / "ref"))

    # reads: e1 b1..b4 -> 1..4, e1 tail -> 5, e2 b1 -> 6, e2 b2 -> 7
    real_shutdown = preempt.GracefulShutdown
    monkeypatch.setattr(
        preempt, "GracefulShutdown", lambda: _CountingShutdown(7))
    out = str(tmp_path / "run")
    _, h1 = train(**common, out_dir=out)
    assert len(h1.history["pred_mse"]) == 1, "epoch 2 should be partial"

    from extended_gan_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(out, "checkpoints"))
    assert mgr.latest_step() == 2 * MID_EPOCH_STRIDE + 2
    mgr.close()

    monkeypatch.setattr(preempt, "GracefulShutdown", real_shutdown)
    s_res, h_res = train(**common, out_dir=out, resume=True)

    for key in h_ref.history:
        np.testing.assert_array_equal(
            np.asarray(h_ref.history[key]), np.asarray(h_res.history[key]),
            err_msg=f"history[{key}] diverged after mid-epoch resume")
    for net in ("g_xy", "g_yx", "d_x"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(s_ref, net).params),
            jax.tree_util.tree_leaves(getattr(s_res, net).params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
