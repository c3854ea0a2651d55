"""Config-driven experiment runner.

Parity with /root/reference/convolutional_gat/generate_experiment.py:10-46,
with ``exec()`` replaced by literal-only config parsing
(extended_gan_tpu.utils.config) — same experiment-dir convention:
``experiments/<name>/config.py`` with UPPER_CASE variables; outputs
(history.json, model.msgpack, pred_*.png, history_*.png) land in the
experiment dir.
"""

from __future__ import annotations

import os
import pathlib

from extended_gan_tpu.train.gat_driver import train
from extended_gan_tpu.utils.config import dump_config, load_experiment_config


def generate_experiment(exp_folder_name: str, **overrides):
    current_dir = str(pathlib.Path(__file__).parent.resolve())
    exp_path = os.path.join(current_dir, "experiments", exp_folder_name)
    cfg = load_experiment_config(exp_path)
    cfg.output_path = exp_path
    kwargs = cfg.to_dict()
    # None = not overridden; explicit falsy values (0, False) DO apply.
    # (The old truthiness filter let CLI defaults silently clobber the
    # config — a config's TRAIN_BATCH_SIZE lost to the CLI's default 32.)
    for k, v in overrides.items():
        if v is not None:
            kwargs[k] = v
            if hasattr(cfg, k):
                setattr(cfg, k, v)
    dump_config(cfg)  # the settings the run ACTUALLY uses
    return train(**kwargs)


if __name__ == "__main__":
    import sys

    generate_experiment(sys.argv[1])
