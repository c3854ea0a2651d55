"""scripts/predict.py: batch inference over a split, end-to-end."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_predict_cli_synthetic(tmp_path):
    from extended_gan_tpu.train.gat_driver import train
    from extended_gan_tpu.utils.config import load_experiment_config

    exp = tmp_path / "exp_predict"
    os.makedirs(exp)
    (exp / "config.py").write_text(
        'MODEL_TYPE = "temporal"\n'
        'MAPPING_TYPE = "conv"\n'
        'DATASET = "synthetic"\n'
        'PREPROCESSED_FOLDER = ""\n'
        "EPOCHS = 1\n"
        "TRAIN_BATCH_SIZE = 8\n"
        "TEST_BATCH_SIZE = 8\n"
        "LEARNING_RATE = 0.001\n"
        "LR_STEP = 1\n"
        "GAMMA = 0.95\n"
        "DOWNSAMPLE_SIZE = (16, 16)\n"
    )
    cfg = load_experiment_config(str(exp))
    cfg.output_path = str(exp)
    kwargs = cfg.to_dict()
    for k in ("data_axis", "model_axis"):
        kwargs.pop(k, None)
    train(max_batches=2, **kwargs)
    assert os.path.exists(exp / "model.msgpack")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import predict
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "preds.npz")
    summary = predict.main([
        str(exp), "--dataset", "synthetic",
        "--downsample-size", "16", "16",
        "--batch-size", "8", "--max-batches", "3", "--out", out,
    ])
    assert summary["samples"] > 0
    assert summary["samples_per_sec"] > 0
    assert np.isfinite(summary["mse"])
    data = np.load(out)
    assert data["predictions"].shape == data["targets"].shape
    assert data["predictions"].shape[1:] == (16, 16, 4, 6)
    # summary must be JSON-clean (the CLI prints it)
    json.dumps(summary)


@pytest.mark.slow
def test_plot_image_cli(tmp_path):
    """plot_image (the working form of the reference's abandoned
    plot_image.py draft): experiment dir + checkpoint -> pred_N.png grid.

    Trains its own checkpoint into tmp first: the repo's
    synthetic_smoke/model.msgpack is gitignored (mirroring the
    reference's `*.pt` ignore), so a fresh checkout doesn't have one."""
    import shutil

    from convolutional_gat.plot_image import main
    from extended_gan_tpu.train.gat_driver import train
    from extended_gan_tpu.utils.config import load_experiment_config

    src = os.path.join(REPO, "convolutional_gat", "experiments",
                       "synthetic_smoke")
    exp = str(tmp_path / "synthetic_smoke")
    shutil.copytree(src, exp)
    for stale in os.listdir(exp):
        if stale != "config.py":
            p = os.path.join(exp, stale)
            os.remove(p) if os.path.isfile(p) else shutil.rmtree(p)
    cfg = load_experiment_config(exp)
    cfg.output_path = exp
    cfg.epochs = 1
    train(max_batches=2, **cfg.to_dict())
    assert os.path.exists(os.path.join(exp, "model.msgpack"))

    out = main([exp, "--dataset", "synthetic", "--raininess", "0.2",
                "--epoch", "3", "--out", str(tmp_path)])
    assert out == str(tmp_path / "pred_3.png")
    assert os.path.exists(out)
