"""Prediction visualisation.

Ports of the reference's two visualizers:

- :func:`visualize_predictions` == dcgan/utils.py:77-101 (input/GT/pred
  rows x frame columns, saved as ``pred.png``),
- :func:`visualize_gat_predictions` == convolutional_gat/utils.py:49-103
  (first val sample with raininess >= threshold, 3x4 grid,
  ``pred_{epoch}.png``).

All inputs are frames-first numpy arrays (B, T, H, W) / (B, H, W, T, V).
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def visualize_predictions(x, y, preds, epoch=1, path="", show_plot=False):
    """x, y, preds: (B, T, H, W). Saves <path>/pred.png."""
    if path != "" and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)
    to_plot = [np.asarray(x[0]), np.asarray(y[0]), np.asarray(preds[0])]
    n_frames = to_plot[0].shape[0]
    _, ax = plt.subplots(nrows=len(to_plot), ncols=n_frames)
    ax = np.atleast_2d(ax)
    plt.suptitle(f"Epoch {epoch}")
    for i, row in enumerate(ax):
        for j, col in enumerate(row):
            col.imshow(to_plot[i][j])
    for ax_, row in zip(ax[:, 0], ["input", "GT", "pred"]):
        ax_.set_ylabel(row)
    for ax_, col in zip(ax[0, :], [f"F{i}" for i in range(n_frames)]):
        ax_.set_title(col)
    save_path = os.path.join(path, "pred.png")
    if not show_plot:
        plt.savefig(save_path)
    else:  # pragma: no cover
        plt.show()
    plt.close()
    return save_path


def visualize_gat_predictions(
    predict_fn,
    loader,
    *,
    epoch: int = 1,
    path: str = "",
    raininess_threshold: float = 0.5,
    power: float = 1.0,
):
    """Find the first sample with raininess >= threshold, plot x/y/pred
    rows x 4 frame columns of vertex 1 (reference utils.py:74-98).

    ``predict_fn(x_batch) -> preds`` over (B, H, W, T, V) arrays.
    """
    plt.clf()
    for x, y in loader:
        for k in range(len(x)):
            raininess = float((x[k] > 0.0).sum()) / x[k].size
            if raininess < raininess_threshold:
                continue
            preds = np.asarray(predict_fn(x))
            to_plot = [
                np.power(np.asarray(v), 1.0 / power)
                for v in (x[k], y[k], preds[k])
            ]
            n_cols = 4
            _fig, ax = plt.subplots(nrows=3, ncols=n_cols)
            plt.title(f"Epoch {epoch}")
            v_idx = min(1, to_plot[0].shape[-1] - 1)
            for i, row in enumerate(ax):
                for j, col in enumerate(row):
                    col.imshow(to_plot[i][:, :, j, v_idx])
            for ax_, label in zip(ax[:, 0], ["x", "y", "preds"]):
                ax_.set_ylabel(label)
            for ax_, label in zip(
                ax[0, :], [f"frame{i+1}" for i in range(n_cols)]
            ):
                ax_.set_title(label)
            save_path = os.path.join(path, f"pred_{epoch}.png")
            plt.savefig(save_path)
            plt.close()
            return save_path
    print("Raininess threshold too strict, hasn't found anything")
    return None
