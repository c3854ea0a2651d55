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
    assert mgr.latest_step() == 2, "preemption checkpoint missing"
    mgr.close()

    monkeypatch.setattr(TrainingHistory, "append", orig_append)
    _, hist2 = train(**common, resume=True)
    assert len(hist2.history["train_mse"]) == 4, "resume did not complete"
