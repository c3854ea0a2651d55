"""Multi-model side-by-side prediction plots from saved checkpoints.

Parity with /root/reference/convolutional_gat/create_plots.py:16-124:
load N models (by experiment dir), find a rainy test sample, and plot
ground truth vs each model's 4 predicted frames.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np
import jax.numpy as jnp

import matplotlib

if not os.environ.get("DISPLAY") and not os.environ.get("MPLBACKEND"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.data.streaming import get_loaders
from extended_gan_tpu.models.registry import build_model
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.checkpoint import load_model
from extended_gan_tpu.train.gat_trainer import _prep_gat_batch, make_gat_eval_step
from extended_gan_tpu.train.optim import adam
from extended_gan_tpu.train.state import create_net_state
from extended_gan_tpu.utils.config import load_experiment_config


def create_comparison_plot(
    experiment_dirs: list[str],
    labels: list[str] | None = None,
    *,
    preprocessed_folder: str = "",
    dataset: str = "kmni",
    downsample_size=(20, 20),
    out_file: str = "comparison_plot.png",
    raininess_threshold: float = 0.3,
    seed: int = 369,
):
    if dataset == "kmni" and not os.path.isdir(
        os.path.join(preprocessed_folder, "train")
    ):
        dataset, preprocessed_folder = "synthetic", ""
    labels = labels or [os.path.basename(d) for d in experiment_dirs]
    mesh = MeshContext.create()
    keys = KeySeq(seed)
    _, test_loader, _ = get_loaders(
        2, 2, preprocessed_folder, None, dataset=dataset,
        downsample_size=tuple(downsample_size), shuffle=True, seed=seed,
    )
    x0, _ = next(iter(test_loader))
    _, w, h, t, v = x0.shape
    # the streaming loader is one-shot: the probe consumed its first
    # batch, so rebuild it before the rainy-sample scan below
    _, test_loader, _ = get_loaders(
        2, 2, preprocessed_folder, None, dataset=dataset,
        downsample_size=tuple(downsample_size), shuffle=True, seed=seed,
    )

    entries = []
    for d in experiment_dirs:
        cfg = load_experiment_config(d)
        model = build_model(
            cfg.model_type, image_width=w, image_height=h, n_vertices=v,
            mapping_type=cfg.mapping_type, time_steps=t,
            moe_experts=getattr(cfg, "moe_experts", 0),
        )
        state = create_net_state(
            model, adam(1e-3), keys.next(),
            jnp.zeros((2, w, h, t, v), jnp.float32),
        )
        ckpt = os.path.join(d, "model.msgpack")
        if not os.path.exists(ckpt):
            # plotting random init under the experiment's name would be a
            # silently misleading artifact (compare_models raises too)
            raise ValueError(f"no checkpoint at {ckpt}; train it first")
        params, bs = load_model(ckpt, state.params, state.batch_stats)
        state = state.replace(params=params, batch_stats=bs)
        entries.append((model, state, make_gat_eval_step(model)))

    power = float(getattr(test_loader, "power", 1.0))
    for x, y in test_loader:
        for k in range(len(x)):
            if (y[k] != 0).sum() / y[k].size < raininess_threshold:
                continue
            preds = []
            xd, yd, mask = _prep_gat_batch(mesh, x, y)  # once per batch
            for model, state, eval_step in entries:
                out = eval_step(state, xd, yd, mask, 0.5, 1.0, power=1.0)
                preds.append(np.asarray(out["y_hat"])[k])
            rows = [np.asarray(y[k])] + preds
            rows = [np.power(r, 1 / power) for r in rows]
            _fig, ax = plt.subplots(nrows=len(rows), ncols=4)
            for i, row_ax in enumerate(np.atleast_2d(ax)):
                for j, col in enumerate(row_ax):
                    v_idx = min(1, rows[i].shape[-1] - 1)
                    col.imshow(rows[i][:, :, j, v_idx])
            for ax_, rl in zip(np.atleast_2d(ax)[:, 0], ["y"] + labels):
                ax_.set_ylabel(rl, fontsize=7)
            plt.savefig(out_file)
            plt.close()
            return out_file
    print("no sufficiently rainy sample found")
    return None


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("dirs", nargs="+")
    parser.add_argument("--out-file", type=str, default="comparison_plot.png")
    parser.add_argument("--preprocessed-folder", type=str, default="")
    args = parser.parse_args()
    create_comparison_plot(
        args.dirs, out_file=args.out_file,
        preprocessed_folder=args.preprocessed_folder,
    )
