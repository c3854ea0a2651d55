"""MNIST-or-synthetic image source for the vanilla GAN example.

The reference downloads MNIST via torchvision (vanilla_gan.py:118-133).
This environment is zero-egress, so we (a) load MNIST from a local copy if
one exists (idx-ubyte or .npz), else (b) generate a deterministic synthetic
digit-blob dataset with the same shape/normalization contract:
float32 images in [-1, 1], shape (N, 1, size, size).
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np


def _load_idx_images(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad idx magic {magic}"
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(n, rows, cols)


def _find_mnist(root: str) -> np.ndarray | None:
    candidates = [
        "train-images-idx3-ubyte",
        "train-images-idx3-ubyte.gz",
        "MNIST/raw/train-images-idx3-ubyte",
        "MNIST/raw/train-images-idx3-ubyte.gz",
        "mnist.npz",
    ]
    for c in candidates:
        p = os.path.join(root, c)
        if os.path.exists(p):
            if p.endswith(".npz"):
                with np.load(p) as z:
                    return z["x_train"]
            return _load_idx_images(p)
    return None


def synthetic_digits(n: int, size: int = 28, seed: int = 0) -> np.ndarray:
    """Deterministic digit-like blobs: mixtures of 2-4 gaussian strokes."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    imgs = np.zeros((n, size, size), np.float32)
    for i in range(n):
        k = rng.randint(2, 5)
        for _ in range(k):
            cx, cy = rng.uniform(size * 0.2, size * 0.8, 2)
            sx, sy = rng.uniform(1.0, 4.0, 2)
            rho = rng.uniform(-0.6, 0.6)
            dx, dy = (xx - cx) / sx, (yy - cy) / sy
            imgs[i] += np.exp(-(dx**2 - 2 * rho * dx * dy + dy**2) / (2 * (1 - rho**2)))
    imgs = imgs / np.maximum(imgs.max(axis=(1, 2), keepdims=True), 1e-6)
    return (imgs * 255).astype(np.uint8)


def load_images(
    data_root: str = "data/mnist", *, img_size: int = 28, n_synthetic: int = 8192
) -> np.ndarray:
    """Return (N, 1, img_size, img_size) float32 images in [-1, 1]."""
    raw = _find_mnist(data_root) if data_root else None
    if raw is None:
        print(
            f"[mnist] no local MNIST under {data_root!r}; "
            f"using {n_synthetic} synthetic digit blobs"
        )
        raw = synthetic_digits(n_synthetic, size=img_size)
    if raw.shape[1] != img_size:
        # nearest-neighbour resize (reference uses transforms.Resize)
        idx = (np.arange(img_size) * raw.shape[1] / img_size).astype(int)
        raw = raw[:, idx][:, :, idx]
    x = raw.astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5  # Normalize([0.5],[0.5]) — reference :127
    return x[:, None, :, :]


def iterate_batches(x: np.ndarray, batch_size: int, *, rng: np.random.RandomState):
    """Shuffled full-epoch batch iterator (drops no samples; last batch may
    be short, matching torch DataLoader defaults)."""
    order = rng.permutation(len(x))
    for i in range(0, len(x), batch_size):
        yield x[order[i : i + batch_size]]
