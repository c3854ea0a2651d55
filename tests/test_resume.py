import json
import os

import numpy as np
import pytest

from extended_gan_tpu.data.synthetic import make_kmni_dataset


@pytest.fixture(scope="module")
def kmni_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kmni_resume")
    make_kmni_dataset(str(d), n_train_files=1, n_test_files=1,
                      frames_per_file=16, n_vertices=6, hw=16)
    return str(d)


def test_gat_checkpoint_and_resume(kmni_dir, tmp_path):
    """Interrupt after 1 epoch, resume, and land at epoch 3 with continuous
    history — the failure-recovery path the reference lacks (SURVEY 5)."""
    from extended_gan_tpu.train.gat_driver import train

    out = str(tmp_path / "exp")
    common = dict(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        output_path=out, train_batch_size=4, test_batch_size=4,
        learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(12, 12), preprocessed_folder=kmni_dir,
        dataset="kmni", max_batches=2, checkpoint_every=1,
    )
    train(epochs=1, **common)
    h1 = json.load(open(os.path.join(out, "history.json")))
    assert len(h1["val_loss"]) == 1

    state, history = train(epochs=3, resume=True, **common)
    assert len(history["val_loss"]) == 3
    # first epoch's numbers survived the restart
    assert history["val_loss"][0] == h1["val_loss"][0]
    assert os.path.isdir(os.path.join(out, "checkpoints"))


def test_resume_restores_step_lr_schedule(kmni_dir, tmp_path):
    """StepLR must continue decaying from the checkpointed epoch, not snap
    back to base_lr (gamma=0.5 makes drift obvious)."""
    from extended_gan_tpu.train.gat_driver import train
    from extended_gan_tpu.train.optim import get_learning_rate

    out = str(tmp_path / "exp_lr")
    common = dict(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        output_path=out, train_batch_size=4, test_batch_size=4,
        learning_rate=1e-2, lr_step=1, gamma=0.5,
        downsample_size=(12, 12), preprocessed_folder=kmni_dir,
        dataset="kmni", max_batches=2, checkpoint_every=1,
    )
    train(epochs=2, **common)          # LR after 2 epochs: 1e-2 * 0.25
    state, _ = train(epochs=3, resume=True, **common)
    # after epoch 3 the schedule must be base * 0.5^3
    assert abs(get_learning_rate(state.opt_state) - 1e-2 * 0.125) < 1e-9
