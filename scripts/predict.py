"""Batch inference / serving entry point.

Load a trained experiment (config.py + model.msgpack) and run frame
prediction over a dataset split, writing predictions (and optional metric
summaries) to an .npz — the productionized version of what the reference
only does implicitly inside its plotting/benchmark scripts
(create_plots.py, compare_models/__main__.py).

Usage:
  python scripts/predict.py convolutional_gat/experiments/demo_unet \
      --preprocessed-folder /tmp/egt_demo_kmni --split test \
      --out /tmp/preds.npz [--downsample-size 20 20] [--batch-size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_dir")
    parser.add_argument("--preprocessed-folder", type=str, default="")
    parser.add_argument("--dataset", type=str, default="kmni")
    parser.add_argument("--split", choices=("train", "val", "test"),
                        default="test")
    parser.add_argument("--downsample-size", type=int, nargs=2,
                        default=(20, 20))
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--out", type=str, default="predictions.npz")
    parser.add_argument("--max-batches", type=int, default=0)
    args = parser.parse_args(argv)

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
    )
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state
    from extended_gan_tpu.utils.config import load_experiment_config

    cfg = load_experiment_config(args.experiment_dir)
    dataset = args.dataset
    folder = args.preprocessed_folder or cfg.preprocessed_folder
    if dataset == "kmni" and not os.path.isdir(os.path.join(folder, "train")):
        print(f"[predict] dataset not found at {folder!r}; using synthetic")
        dataset, folder = "synthetic", ""

    loaders = get_loaders(
        args.batch_size, args.batch_size, folder, None, dataset=dataset,
        downsample_size=tuple(args.downsample_size), shuffle=False,
    )
    loader = dict(zip(("train", "val", "test"), loaders))[args.split]
    probe_x, _ = next(iter(loader))
    _, w, h, t, v = probe_x.shape

    mesh = MeshContext.create()
    keys = KeySeq(cfg.seed)
    model = build_model(
        cfg.model_type, image_width=w, image_height=h, n_vertices=v,
        mapping_type=cfg.mapping_type, time_steps=t,
        moe_experts=getattr(cfg, "moe_experts", 0),
    )
    state = create_net_state(
        model, adam(1e-3), keys.next(), jnp.zeros((2, w, h, t, v)))
    ckpt = os.path.join(args.experiment_dir, "model.msgpack")
    if not os.path.exists(ckpt):
        raise SystemExit(f"no checkpoint at {ckpt}; train the experiment "
                         f"first (generate_experiment)")
    params, bs = load_model(ckpt, state.params, state.batch_stats)
    state = mesh.put_replicated(state.replace(params=params, batch_stats=bs))
    eval_step = make_gat_eval_step(model)

    preds, targets = [], []
    t0 = time.time()
    n = 0
    # fresh loader (the probe consumed a batch)
    loaders = get_loaders(
        args.batch_size, args.batch_size, folder, None, dataset=dataset,
        downsample_size=tuple(args.downsample_size), shuffle=False,
    )
    loader = dict(zip(("train", "val", "test"), loaders))[args.split]
    for i, (x, y) in enumerate(loader):
        if args.max_batches and i >= args.max_batches:
            break
        xd, yd, mask = _prep_gat_batch(mesh, x, y)
        out = eval_step(state, xd, yd, mask, 0.5, 1.0, power=1.0)
        preds.append(np.asarray(out["y_hat"])[: len(x)])
        targets.append(np.asarray(y, np.float32))
        n += len(x)
    dt = time.time() - t0
    preds = np.concatenate(preds)
    targets = np.concatenate(targets)
    mse = float(((preds - targets) ** 2).mean())
    np.savez_compressed(args.out, predictions=preds, targets=targets)
    summary = {
        "experiment": args.experiment_dir,
        "split": args.split,
        "samples": int(n),
        "seconds": round(dt, 3),
        "samples_per_sec": round(n / dt, 2),
        "mse": mse,
        "out": args.out,
    }
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
