import json
import os

import numpy as np
import pytest

from extended_gan_tpu.data.synthetic import make_kmni_dataset


@pytest.fixture(scope="module")
def kmni_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kmni")
    make_kmni_dataset(str(d), n_train_files=2, n_test_files=1,
                      frames_per_file=20, n_vertices=6, hw=24)
    return str(d)


@pytest.mark.slow
def test_gat_train_end_to_end(kmni_dir, tmp_path):
    from extended_gan_tpu.train.gat_driver import train

    out = str(tmp_path / "exp")
    state, history = train(
        model_type="temporal", optimizer="adam", mapping_type="conv",
        output_path=out, train_batch_size=8, test_batch_size=8,
        epochs=2, learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(16, 16), preprocessed_folder=kmni_dir,
        dataset="kmni", max_batches=4,
    )
    assert len(history["train_loss"]) == 2
    assert len(history["val_loss"]) == 2
    assert all(np.isfinite(v) for v in history["val_loss"])
    # artifacts (reference train.py:149-155, 246-259)
    assert os.path.exists(os.path.join(out, "history.json"))
    assert os.path.exists(os.path.join(out, "model.msgpack"))
    assert os.path.exists(os.path.join(out, "history_2.png"))
    saved = json.load(open(os.path.join(out, "history.json")))
    assert set(saved) >= {"train_loss", "val_loss", "val_acc", "val_prec",
                          "val_rec", "val_denorm_mse"}


def test_gat_training_reduces_loss(kmni_dir, tmp_path):
    from extended_gan_tpu.train.gat_driver import train

    state, history = train(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        output_path="", train_batch_size=8, test_batch_size=8,
        epochs=3, learning_rate=1e-2, lr_step=1, gamma=0.95,
        downsample_size=(16, 16), preprocessed_folder=kmni_dir,
        dataset="kmni", reduce_lr_on_plateau=True,
    )
    # rain fields are smooth and temporally coherent: the model must beat
    # its untrained val loss within 3 epochs (strictly — a 1.05 fudge
    # factor would tolerate training that makes the model WORSE)
    assert history["val_loss"][-1] < history["val_loss"][0]


def test_plateau_scheduler_halves_lr():
    from extended_gan_tpu.train.optim import ReduceLROnPlateau

    s = ReduceLROnPlateau(1.0, factor=0.5, patience=0)
    assert s.step(1.0) == 1.0   # first value = best
    assert s.step(2.0) == 0.5   # worse -> halve
    assert s.step(0.5) == 0.5   # better -> keep
    assert s.step(0.6) == 0.25  # worse -> halve


def test_step_lr_schedule():
    from extended_gan_tpu.train.optim import StepLR

    s = StepLR(1.0, step_size=2, gamma=0.1)
    assert s.current() == 1.0
    s.step()
    assert s.current() == 1.0
    s.step()
    assert abs(s.current() - 0.1) < 1e-12


def test_plateau_uses_torch_rel_threshold():
    """torch ReduceLROnPlateau only counts an epoch as improved when it
    beats best by >1e-4 RELATIVE; a strict `<` forked the LR schedule 2x
    from the reference's on near-tie val losses (round-2 review)."""
    from extended_gan_tpu.train.optim import ReduceLROnPlateau

    s = ReduceLROnPlateau(1.0, factor=0.5, patience=0)
    s.step(1.0)
    # relative improvement of 5e-5 < threshold 1e-4: a BAD epoch in torch
    lr = s.step(1.0 * (1 - 5e-5))
    assert lr == 0.5, lr
    # a genuine improvement resets
    lr = s.step(0.9)
    assert lr == 0.5
    lr = s.step(0.9)  # identical value: bad epoch again
    assert lr == 0.25
