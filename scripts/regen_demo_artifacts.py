"""Regenerate committed demo-experiment artifacts + compare_models results.

The demo experiment dirs (demo_temporal_conv, demo_unet) and the two
BASELINE.md rows previously unreproducible by compare_models
(final_1d_gat = BaselineModel, final_2d_baseline = BaselineModel2D —
round-2 VERDICT item 4) are trained on the shared synthetic KNMI demo
archive (/tmp/egt_demo_kmni, the PREPROCESSED_FOLDER the demo configs
point at), then the compare_models harness re-evaluates all four from
their configs + best-val checkpoints and refreshes
convolutional_gat/compare_models/results/.

Run on the TPU (or CPU — slower): python scripts/regen_demo_artifacts.py
Optionally: --epochs-cap N to bound each run, --skip-train to only
re-run compare_models over existing checkpoints.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEMO_DATA = "/tmp/egt_demo_kmni"
EXPERIMENTS = (
    "demo_temporal_conv",
    "demo_unet",
    "final_1d_gat",
    "final_2d_baseline",
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-cap", type=int, default=0,
                    help="cap each experiment's EPOCHS (0 = use config)")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-compare", action="store_true",
                    help="train only; don't refresh compare_models results")
    ap.add_argument("--experiments", nargs="*", default=list(EXPERIMENTS),
                    help='dir names, or "all" for every experiment dir, '
                         'or "missing" for dirs without a history.json')
    args = ap.parse_args(argv)

    from extended_gan_tpu.data.synthetic import make_kmni_dataset
    from extended_gan_tpu.train.gat_driver import train
    from extended_gan_tpu.utils.config import load_experiment_config

    if not os.path.isdir(os.path.join(DEMO_DATA, "train")):
        print(f"[regen] generating synthetic KNMI demo archive {DEMO_DATA}")
        make_kmni_dataset(DEMO_DATA, n_train_files=6, n_test_files=2,
                          frames_per_file=120, n_vertices=6, hw=80, seed=7)

    base = os.path.join(REPO, "convolutional_gat", "experiments")
    if args.experiments in (["all"], ["missing"]):
        names = sorted(
            d for d in os.listdir(base)
            if os.path.isfile(os.path.join(base, d, "config.py")))
        if args.experiments == ["missing"]:
            names = [d for d in names if not os.path.isfile(
                os.path.join(base, d, "history.json"))]
        args.experiments = names
        print(f"[regen] resolved to {len(names)} experiment dirs")
    if not args.skip_train:
        for name in args.experiments:
            exp_dir = os.path.join(base, name)
            cfg = load_experiment_config(exp_dir)
            cfg.preprocessed_folder = DEMO_DATA
            cfg.output_path = exp_dir
            kwargs = cfg.to_dict()
            if args.epochs_cap:
                kwargs["epochs"] = min(kwargs["epochs"], args.epochs_cap)
            print(f"\n[regen] === training {name} "
                  f"({kwargs['model_type']}/{kwargs['mapping_type']}, "
                  f"{kwargs['epochs']} epochs) ===")
            train(**kwargs)

    if args.skip_compare:
        print("[regen] --skip-compare: done")
        return

    from convolutional_gat.compare_models.__main__ import compare_models

    out = os.path.join(REPO, "convolutional_gat", "compare_models",
                       "results")
    compare_models(
        base, list(args.experiments), out_path=out,
        downsample_size=(20, 20), preprocessed_folder=DEMO_DATA,
        dataset="kmni",
    )
    print(f"[regen] refreshed {out}")


if __name__ == "__main__":
    main()
