"""End-to-end compare_models harness on synthetic data: train two tiny
experiments, then rebuild-from-config + checkpoint and emit
results.json/html + plot (reference compare_models/__main__.py:81-134)."""

import json
import os
import shutil

import pytest


@pytest.mark.slow
def test_compare_models_end_to_end(tmp_path):
    base = tmp_path / "experiments"
    for name, mtype, mapping in (
        ("exp_temporal_conv", "temporal", "conv"),
        ("exp_baseline", "baseline", "linear"),
    ):
        d = base / name
        os.makedirs(d)
        (d / "config.py").write_text(
            f'MODEL_TYPE = "{mtype}"\n'
            f'MAPPING_TYPE = "{mapping}"\n'
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
        from extended_gan_tpu.train.gat_driver import train
        from extended_gan_tpu.utils.config import load_experiment_config

        cfg = load_experiment_config(str(d))
        cfg.output_path = str(d)
        kwargs = cfg.to_dict()
        for k in ("data_axis", "model_axis"):
            kwargs.pop(k, None)
        train(max_batches=2, **kwargs)
        assert os.path.exists(d / "model.msgpack")

    from convolutional_gat.compare_models.__main__ import compare_models

    out = tmp_path / "results"
    compare_models(
        str(base),
        ["exp_temporal_conv", "exp_baseline"],
        out_path=str(out),
        downsample_size=(16, 16),
        preprocessed_folder="",
        dataset="synthetic",
    )
    results = json.load(open(out / "results.json"))
    assert set(results) == {"exp_temporal_conv", "exp_baseline"}
    for metrics in results.values():
        assert "val_loss" in metrics
        assert "n_parameters" in metrics
        assert "eval_time_s" in metrics
    assert os.path.exists(out / "results.html")
    assert os.path.exists(out / "multi_model_plot.png")
    # reference results dir parity: single-model prediction grid
    assert os.path.exists(out / "pred_0.png")
