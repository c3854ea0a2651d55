"""Model benchmark harness.

Parity with /root/reference/convolutional_gat/compare_models/__main__.py:
rebuild each model from its experiment dir's config.py + best-val
checkpoint, re-run the shared eval on the test set with wall-clock timing
and a parameter count, and emit results.json + results.html + a
side-by-side multi-model prediction plot.

Fix over the reference: ``forward_pass_time_s`` there divides an eval-loop
total by 1000 (:28-31 — not a per-pass latency). We report BOTH the
reference-compatible field and an honest per-batch ``eval_time_s``.
"""

from __future__ import annotations

import json
import os
import time
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.data.streaming import get_loaders
from extended_gan_tpu.models.registry import build_model
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.checkpoint import load_model
from extended_gan_tpu.train.gat_trainer import (
    _prep_gat_batch,
    make_gat_eval_step,
    test,
)
from extended_gan_tpu.train.optim import adam
from extended_gan_tpu.train.state import create_net_state, param_count
from extended_gan_tpu.utils.config import load_experiment_config

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def get_metrics(entries, mesh, preprocessed_folder, dataset,
                downsample_size, seed=369):
    """== reference __main__.py:14-34 (per-model eval + timing + size)."""
    results = {}
    for folder, (model, state, eval_step) in entries.items():
        _, test_loader, _ = get_loaders(
            2, 100, preprocessed_folder, None, dataset=dataset,
            downsample_size=downsample_size, merge_nodes=False,
            shuffle=True, seed=seed,
        )
        # warm-up pass first: the initial test() invocation pays the XLA
        # compile, which would otherwise dominate "eval_time_s" and make
        # the per-model timing column meaningless
        metrics = test(eval_step, state, test_loader, mesh)
        _, test_loader, _ = get_loaders(
            2, 100, preprocessed_folder, None, dataset=dataset,
            downsample_size=downsample_size, merge_nodes=False,
            shuffle=True, seed=seed,
        )
        t0 = time.time()
        metrics = test(eval_step, state, test_loader, mesh)
        t1 = time.time()
        metrics["forward_pass_time_s"] = (t1 - t0) / 1000  # ref-compatible
        metrics["eval_time_s"] = t1 - t0
        metrics["n_parameters"] = param_count(state)
        results[folder] = metrics
    return results


def plot(out_path, loader, entries, mesh, raininess_threshold=0.3):
    """== reference __main__.py:37-60 (side-by-side prediction rows)."""
    folders = list(entries.keys())
    _fig, ax = plt.subplots(nrows=len(folders) + 1, ncols=4)
    power = float(getattr(loader, "power", 1.0))
    for x, y in loader:
        for k in range(len(x)):
            raininess = (y[k] != 0).sum() / y[k].size
            if raininess < raininess_threshold:
                continue
            preds = []
            xd, yd, mask = _prep_gat_batch(mesh, x, y)  # once per batch
            for model, state, eval_step in entries.values():
                out = eval_step(state, xd, yd, mask, 0.5, 1.0, power=1.0)
                preds.append(np.asarray(out["y_hat"])[k])
            to_plot = [np.asarray(y[k])] + preds
            to_plot = [np.power(tp, 1 / power) for tp in to_plot]
            for i, row in enumerate(ax):
                for j, col in enumerate(row):
                    v_idx = min(1, to_plot[i].shape[-1] - 1)
                    col.imshow(to_plot[i][:, :, j, v_idx])
            row_labels = ["y"] + [" ".join(f.split("_")[1:]) for f in folders]
            for ax_, rl in zip(ax[:, 0], row_labels):
                ax_.set_ylabel(rl)
            for ax_, cl in zip(ax[0, :],
                               [f"frame{i+1}" for i in range(4)]):
                ax_.set_title(cl)
            plt.savefig(os.path.join(out_path, "multi_model_plot.png"))
            plt.close()
            return


def json_to_table(data: dict, out_path: str) -> str:
    """== reference __main__.py:63-78 (results.html)."""
    result = "<table>"
    model_keys = list(data.keys())
    result += (
        "<head><th>"
        + "".join(f"<td>{k.replace('_', ' ')}</td>" for k in model_keys)
        + "</th></head><tbody>"
    )
    feature_keys = data[model_keys[0]].keys()
    for fk in feature_keys:
        result += f"<tr><td>{fk.replace('_', ' ')}</td>"
        for mk in model_keys:
            result += f"<td>{data[mk][fk]:.5f}</td>"
        result += "</tr>"
    result += "</tbody></table>"
    with open(os.path.join(out_path, "results.html"), "w") as f:
        f.write(result)
    return result


def compare_models(
    base_path: str,
    folders: list[str],
    out_path: str = "",
    downsample_size=(20, 20),
    preprocessed_folder: str = "/mnt/kmni_dataset/20_plus_preprocessed",
    dataset: str = "kmni",
    plot_only: bool = False,
    seed: int = 369,
):
    """== reference __main__.py:81-134."""
    if dataset == "kmni" and not os.path.isdir(
        os.path.join(preprocessed_folder, "train")
    ):
        print(f"[compare_models] dataset not found at {preprocessed_folder!r}"
              "; using synthetic")
        dataset, preprocessed_folder = "synthetic", ""
    os.makedirs(out_path, exist_ok=True)
    mesh = MeshContext.create()
    keys = KeySeq(seed)
    train_loader, test_loader, _ = get_loaders(
        2, 2, preprocessed_folder, None, dataset=dataset,
        downsample_size=tuple(downsample_size), merge_nodes=False,
        shuffle=True, seed=seed,
    )
    x, _y = next(iter(train_loader))
    _, image_width, image_height, steps, n_vertices = x.shape

    entries = {}
    for folder in folders:
        data_folder = os.path.join(base_path, folder)
        cfg = load_experiment_config(data_folder)
        model = build_model(
            cfg.model_type,
            image_width=image_width, image_height=image_height,
            n_vertices=n_vertices, mapping_type=cfg.mapping_type,
            time_steps=steps,
            moe_experts=getattr(cfg, "moe_experts", 0),
        )
        tx = adam(1e-3)
        state = create_net_state(
            model, tx, keys.next(),
            jnp.zeros((2, image_width, image_height, steps, n_vertices),
                      jnp.float32),
        )
        model_path = os.path.join(data_folder, "model.msgpack")
        if os.path.exists(model_path):
            params, batch_stats = load_model(
                model_path, state.params, state.batch_stats)
            state = state.replace(params=params, batch_stats=batch_stats)
        else:
            raise ValueError(f"error: {model_path}")
        entries[folder] = (model, state, make_gat_eval_step(model))

    if not plot_only:
        results = get_metrics(entries, mesh, preprocessed_folder, dataset,
                              tuple(downsample_size), seed=seed)
        print(json_to_table(results, out_path))
        print(json.dumps(results, indent=4))
        with open(os.path.join(out_path, "results.json"), "w") as f:
            json.dump(results, f, indent=4)
    plot(out_path, test_loader, entries, mesh)
    # pred_0.png — the reference's results dir also carries a single-model
    # prediction grid (compare_models/results/pred_0.png)
    from extended_gan_tpu.utils.viz import visualize_gat_predictions

    _, viz_loader, _ = get_loaders(
        2, 2, preprocessed_folder, None, dataset=dataset,
        downsample_size=tuple(downsample_size), merge_nodes=False,
        shuffle=True, seed=seed,
    )
    first_model, first_state, first_eval = next(iter(entries.values()))

    def _predict(xb):
        xb = np.asarray(xb, np.float32)
        xd, yd, mask = _prep_gat_batch(mesh, xb, xb)
        out = first_eval(first_state, xd, yd, mask, 0.5, 1.0, power=1.0)
        return np.asarray(out["y_hat"])[: len(xb)]

    visualize_gat_predictions(
        _predict, viz_loader, epoch=0, path=out_path,
        power=float(getattr(viz_loader, "power", 1.0)),
    )
    return entries


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--base-folder", type=str,
                        default="convolutional_gat/experiments")
    parser.add_argument("--folders", nargs="+",
                        default=["local_temporal_conv", "local_unet"])
    parser.add_argument("--out-path", type=str,
                        default="convolutional_gat/compare_models/results")
    parser.add_argument("--preprocessed-folder", type=str,
                        default="/mnt/kmni_dataset/20_plus_preprocessed")
    parser.add_argument("--dataset", type=str, default="kmni")
    parser.add_argument("--plot-only", action="store_true")
    args = parser.parse_args()
    compare_models(
        args.base_folder, args.folders, out_path=args.out_path,
        preprocessed_folder=args.preprocessed_folder, dataset=args.dataset,
        plot_only=args.plot_only,
    )
