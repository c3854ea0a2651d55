"""Single-prediction grid plot for a trained experiment.

The reference's ``convolutional_gat/plot_image.py`` is an abandoned draft
(undefined ``model`` name, dead loops) whose evident intent is: load a
trained model, find the first sufficiently-rainy sample, and save a
3-row (x / y / preds) x 4-frame grid. This is that intent, working:
the grid itself is rendered by
:func:`extended_gan_tpu.utils.viz.visualize_gat_predictions` (the same
code the training drivers use for their per-epoch ``pred_N.png``).

Usage:
  python -m convolutional_gat.plot_image <experiment_dir> \
      [--preprocessed-folder DIR] [--dataset kmni] [--split test] \
      [--downsample-size 20 20] [--raininess 0.5] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="convolutional_gat.plot_image")
    parser.add_argument("experiment_dir")
    parser.add_argument("--preprocessed-folder", type=str, default="")
    parser.add_argument("--dataset", type=str, default="kmni")
    parser.add_argument("--split", choices=("train", "val", "test"),
                        default="test")
    parser.add_argument("--downsample-size", type=int, nargs=2,
                        default=None,
                        help="crop geometry (default: the experiment "
                             "config's DOWNSAMPLE_SIZE)")
    parser.add_argument("--raininess", type=float, default=0.5,
                        help="minimum rainy-pixel fraction of the sample "
                             "to plot (reference utils.py:81)")
    parser.add_argument("--epoch", type=int, default=1,
                        help="label + output filename suffix (pred_N.png)")
    parser.add_argument("--out", type=str, default="",
                        help="output directory (default: the experiment "
                             "dir)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.data.streaming import get_loaders
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.checkpoint import load_model
    from extended_gan_tpu.train.gat_driver import _predict_batch
    from extended_gan_tpu.train.gat_trainer import make_gat_eval_step
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state
    from extended_gan_tpu.utils.config import load_experiment_config
    from extended_gan_tpu.utils.viz import visualize_gat_predictions

    cfg = load_experiment_config(args.experiment_dir)
    if args.downsample_size is None:
        args.downsample_size = cfg.downsample_size
    dataset = args.dataset
    folder = args.preprocessed_folder or cfg.preprocessed_folder
    if dataset == "kmni" and not os.path.isdir(os.path.join(folder, "train")):
        print(f"[plot_image] dataset not found at {folder!r}; "
              f"using synthetic")
        dataset, folder = "synthetic", ""

    loaders = get_loaders(
        2, 2, folder, None, dataset=dataset,
        downsample_size=tuple(args.downsample_size), shuffle=False,
    )
    loader = dict(zip(("train", "val", "test"), loaders))[args.split]
    probe_x, _ = next(iter(loader))
    _, w, h, t, v = probe_x.shape

    mesh = MeshContext.create()
    model = build_model(
        cfg.model_type, image_width=w, image_height=h, n_vertices=v,
        mapping_type=cfg.mapping_type, time_steps=t,
        moe_experts=getattr(cfg, "moe_experts", 0),
    )
    state = create_net_state(
        model, adam(1e-3), KeySeq(cfg.seed).next(),
        jnp.zeros((2, w, h, t, v)))
    ckpt = os.path.join(args.experiment_dir, "model.msgpack")
    if not os.path.exists(ckpt):
        raise SystemExit(f"no checkpoint at {ckpt}; train the experiment "
                         f"first (generate_experiment)")
    params, bs = load_model(ckpt, state.params, state.batch_stats)
    state = mesh.put_replicated(state.replace(params=params, batch_stats=bs))
    eval_step = make_gat_eval_step(model)

    out_dir = args.out or args.experiment_dir
    os.makedirs(out_dir, exist_ok=True)
    loaders = get_loaders(  # fresh (the probe consumed a batch)
        2, 2, folder, None, dataset=dataset,
        downsample_size=tuple(args.downsample_size), shuffle=False,
    )
    loader = dict(zip(("train", "val", "test"), loaders))[args.split]
    path = visualize_gat_predictions(
        lambda xb: _predict_batch(eval_step, state, mesh, xb),
        loader, epoch=args.epoch, path=out_dir,
        raininess_threshold=args.raininess,
        power=float(getattr(loader, "power", 1.0)),
    )
    if path is None:
        print(f"[plot_image] no sample with raininess >= {args.raininess} "
              f"in the {args.split} split; nothing plotted")
    else:
        print(f"[plot_image] wrote {path}")
    return path


if __name__ == "__main__":
    main()
