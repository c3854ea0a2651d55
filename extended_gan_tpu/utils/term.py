"""Terminal image rendering.

The reference shells out to the ``climage`` package to print prediction
frames into the terminal (convolutional_gat/utils.py:25-46). climage isn't
available here; this is a small native renderer using ANSI 256-color
half-block characters (two pixels per character cell), no dependencies.
"""

from __future__ import annotations

import numpy as np

_RESET = "\x1b[0m"


def _gray_code(v: float) -> int:
    """Map [0,1] to the ANSI 256 grayscale ramp (232..255)."""
    return 232 + int(np.clip(v, 0.0, 1.0) * 23.999)


def render_image(img: np.ndarray, width: int = 40) -> str:
    """Render a 2-D array as ANSI half-blocks, normalized to its range."""
    img = np.asarray(img, np.float32)
    lo, hi = float(img.min()), float(img.max())
    img = (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)
    h, w = img.shape
    step = max(1, w // width)
    img = img[:: step * 2 // 2][:, ::step]  # subsample columns
    # pair rows: upper pixel = fg (▀), lower pixel = bg
    rows = []
    for r in range(0, img.shape[0] - 1, 2):
        line = []
        for c in range(img.shape[1]):
            fg = _gray_code(img[r, c])
            bg = _gray_code(img[r + 1, c])
            line.append(f"\x1b[38;5;{fg}m\x1b[48;5;{bg}m▀")
        rows.append("".join(line) + _RESET)
    return "\n".join(rows)


def term_display(y, y_hat, width: int = 40) -> str:
    """Side-by-side truth/prediction terminal view
    (reference convolutional_gat/utils.py:25-46, climage-free).

    Accepts (..., H, W)-leading arrays; the first 2-D slice is shown.
    """
    def first_2d(a):
        a = np.asarray(a)
        while a.ndim > 2:
            a = a[0]
        return a

    left = render_image(first_2d(y), width).split("\n")
    right = render_image(first_2d(y_hat), width).split("\n")
    out = ["y" + " " * (width - 1) + " | y_hat"]
    for l, r in zip(left, right):
        out.append(f"{l} | {r}")
    text = "\n".join(out)
    print(text)
    return text
