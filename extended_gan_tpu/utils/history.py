"""Training history tracking and plotting.

Clone of the reference's TrainingHistory (dcgan/utils.py:10-60) and the
dict-based history helpers (convolutional_gat/utils.py:106-132,
convolutional_gat/train.py:149-150): key-substring grouping into plot files,
per-epoch append, JSON persistence.
"""

from __future__ import annotations

import json
import os

import matplotlib

# Headless boxes need the non-GUI backend, but a notebook/interactive
# session that imports this package for the metrics should keep whatever
# backend it already configured — only force Agg when nothing else chose.
if not os.environ.get("DISPLAY") and not os.environ.get("MPLBACKEND"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt


class TrainingHistory:
    """Per-epoch scalar history with grouped plots.

    Groups are substring filters applied in order; each key lands in the
    first group whose substring it contains (dcgan/utils.py:31-60). The
    empty-string group catches the rest and is plotted as "metrics".
    """

    def __init__(
        self,
        history: dict | None = None,
        groups: tuple[str, ...] = ("mse", "disc", ""),
        save_path: str = "training_plots",
    ):
        self.save_path = save_path
        self.groups = groups
        self.history: dict[str, list[float]] = history if history is not None else {}

    def append(self, new_data: dict) -> "TrainingHistory":
        for key, val in new_data.items():
            self.history.setdefault(key, []).append(float(val))
        return self

    def to_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.history, f, indent=4)

    @classmethod
    def from_json(cls, path: str, **kwargs) -> "TrainingHistory":
        with open(path) as f:
            return cls(history=json.load(f), **kwargs)

    def plot(self, save: bool = True):
        os.makedirs(self.save_path, exist_ok=True)
        keys = list(self.history.keys())
        used: list[str] = []
        key_groups: list[list[str]] = []
        for group_key in self.groups:
            group: list[str] = []
            key_groups.append(group)
            for key in keys:
                if key not in used and group_key in key:
                    group.append(key)
                    used.append(key)
        for i, group in enumerate(key_groups):
            if not group:
                continue
            plt.clf()
            for key in group:
                plt.plot(self.history[key], label=key.replace("_", " "))
            plt.legend()
            plt.title("Training History")
            if save:
                name = self.groups[i] if self.groups[i] != "" else "metrics"
                plt.savefig(os.path.join(self.save_path, name))
            else:  # pragma: no cover - interactive
                plt.show()
            plt.close()


def update_history(history: dict[str, list[float]], data: dict[str, float]):
    """Clone of convolutional_gat/utils.py:128-132."""
    for key, val in data.items():
        history.setdefault(key, []).append(float(val))


def plot_history(
    history: dict[str, list[float]],
    title: str = "Training History",
    save: bool = False,
    filename: str = "history",
):
    """Clone of convolutional_gat/utils.py:106-125 (train/val loss curves)."""
    plt.clf()
    plt.plot(history.get("train_loss", []), label="Train loss")
    plt.plot(history.get("val_loss", []), label="Val loss")
    plt.legend()
    plt.title(title)
    if save:
        plt.savefig(filename)
    else:  # pragma: no cover - interactive
        plt.show()
    plt.close()


def save_history_json(history: dict, output_path: str):
    with open(os.path.join(output_path, "history.json"), "w") as f:
        json.dump(history, f, indent=4)
