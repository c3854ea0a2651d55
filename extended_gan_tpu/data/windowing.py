"""Zero-copy sliding-window segmentation.

The reference builds overlapping frame windows with Python list
comprehensions + torch.stack per file (data_loader.py:49-58,
kmni_data_loader.py:79-93) — an O(N*W) host copy per file per epoch. Here
windows are numpy stride-tricks views: zero copy until a batch slice is
materialized for transfer.
"""

from __future__ import annotations

import numpy as np


def sliding_windows(data: np.ndarray, window: int) -> np.ndarray:
    """All overlapping windows along axis 0.

    (N, ...) -> view of shape (N - window + 1, window, ...).
    """
    if len(data) < window:
        return np.empty((0, window) + data.shape[1:], data.dtype)
    view = np.lib.stride_tricks.sliding_window_view(data, window, axis=0)
    # sliding_window_view puts the window axis last; bring it to axis 1
    return np.moveaxis(view, -1, 1)


def split_xy(windows: np.ndarray, in_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Split (n, in+out, ...) windows into (x, y)."""
    return windows[:, :in_len], windows[:, in_len:]


def truncate_to_multiple(data: np.ndarray, m: int) -> np.ndarray:
    """data[: (len//m)*m] — reference's length alignment
    (data_loader.py:45, kmni_data_loader.py:76)."""
    return data[: (len(data) // m) * m]
