import json
import os
import time

from extended_gan_tpu.utils.profiling import StepTimer, annotate
from extended_gan_tpu.utils.term import render_image, term_display

import numpy as np
import pytest


def test_step_timer_stats():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.stats()
    assert s["steps"] == 3
    # upper bound is generous: on a loaded 1-core host sleep(0.01) can
    # overshoot by 10x+; the assertion targets bookkeeping, not precision
    assert 0.005 < s["mean_s"] < 5.0
    assert s["steps_per_sec"] > 0


def test_annotate_context():
    with annotate("unit-test-region"):
        pass


def test_term_render():
    img = np.linspace(0, 1, 64).reshape(8, 8)
    out = render_image(img, width=8)
    assert "\x1b[" in out and "▀" in out


def test_term_display_side_by_side(capsys):
    y = np.random.RandomState(0).rand(1, 8, 8)
    out = term_display(y, y, width=8)
    assert "y_hat" in out


def test_epoch_profiler_stats():
    from extended_gan_tpu.utils.profiling import EpochProfiler

    p = EpochProfiler()
    p.start_epoch()
    for _ in range(5):
        with p.step():
            time.sleep(0.002)
    s = p.end_epoch()
    assert s["profiled_steps"] == 5
    assert s["epoch_wall_s"] > 0.008
    assert s["steps_per_sec"] > 0
    assert 0 < s["dispatch_mean_s"] < 5.0


def test_gat_driver_profile_into_history(tmp_path):
    """`--profile` records per-epoch step timing into history.json."""
    from extended_gan_tpu.data.synthetic import make_kmni_dataset
    from extended_gan_tpu.train.gat_driver import train

    d = tmp_path / "kmni"
    make_kmni_dataset(str(d), n_train_files=1, n_test_files=1,
                      frames_per_file=26, n_vertices=6, hw=16)
    out = str(tmp_path / "exp")
    _, history = train(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        output_path=out, train_batch_size=4, test_batch_size=4,
        epochs=1, learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(16, 16), preprocessed_folder=str(d),
        dataset="kmni", max_batches=4, plot=False, profile=True,
    )
    with open(os.path.join(out, "history.json")) as f:
        saved = json.load(f)
    for k in ("steps_per_sec", "epoch_wall_s", "dispatch_mean_s"):
        assert k in history and len(history[k]) == 1
        assert k in saved
    assert history["steps_per_sec"][0] > 0


@pytest.mark.slow
def test_dcgan_driver_profile_into_history(tmp_path):
    from extended_gan_tpu.train.dcgan_driver import train

    _, history = train(
        epochs=1, train_batch_size=4, test_batch_size=4, max_batches=2,
        synthetic=True, out_dir=str(tmp_path), seed=3,
        params={"ndf": 8, "imsize": 64}, profile=True,
    )
    h = history.history
    assert h["steps_per_sec"][-1] > 0
    assert h["epoch_wall_s"][-1] > 0
