"""Synthetic dataset generation in the reference's on-disk formats.

The reference assumes real KNMI-radar / coastal-sea datasets mounted under
/mnt (dcgan/train.py:242, kmni_data_loader.py:174). This environment is
zero-egress, so we generate physically-plausible synthetic stand-ins —
advecting smooth "rain cells" with temporal coherence (so frame prediction
is learnable) — written in the exact formats the loaders consume:

- coastal: <dir>/{train,test}/*.pt float (T, 1, H, W) in [0, 1],
- h5:      <dir>/{train,test}/*.h5 key "default" (T, 1, H, W),
- kmni:    <dir>/{train,test}/*.pt integer-valued (T, V, H, W) in [0, 254],
- arai:    <dir>/{training,validation}/*.pt (T, R, 1, H, W) + metadata.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .io import save_array, mkdir


# Weather regimes for heterogeneous archives (the setting conditional
# capacity targets: storm-vs-drizzle inputs routing to different experts).
# Each regime fixes the cell-count / amplitude / advection-speed / size
# ranges _rain_video samples from; None keeps the original mixed defaults.
REGIMES = {
    None: dict(n_cells=None, amp=(0.4, 1.0), vel=1.5, sig=(0.06, 0.22)),
    # convective: few intense, large, fast-moving cells
    "storm": dict(n_cells=7, amp=(0.7, 1.0), vel=3.0, sig=(0.12, 0.30)),
    # stratiform: many faint, small, nearly-static cells
    "drizzle": dict(n_cells=3, amp=(0.12, 0.32), vel=0.4, sig=(0.04, 0.09)),
}


def _rain_video(
    rng: np.random.Generator,
    n_frames: int,
    h: int,
    w: int,
    n_cells: int = 4,
    max_val: float = 1.0,
    regime: str | None = None,
) -> np.ndarray:
    """(T, H, W) float video of advecting anisotropic gaussian cells."""
    spec = REGIMES[regime]
    if spec["n_cells"] is not None:
        n_cells = spec["n_cells"]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    pos = rng.uniform([0, 0], [h, w], (n_cells, 2)).astype(np.float32)
    vel = rng.uniform(-spec["vel"], spec["vel"], (n_cells, 2)).astype(
        np.float32
    )
    sig = rng.uniform(
        min(h, w) * spec["sig"][0], min(h, w) * spec["sig"][1], n_cells
    ).astype(np.float32)
    amp = rng.uniform(*spec["amp"], n_cells).astype(np.float32)
    frames = np.zeros((n_frames, h, w), np.float32)
    for t in range(n_frames):
        for c in range(n_cells):
            cy, cx = pos[c] + vel[c] * t
            cy, cx = cy % h, cx % w
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            frames[t] += amp[c] * np.exp(-d2 / (2 * sig[c] ** 2))
    frames = np.clip(frames, 0, 1) * max_val
    return frames


def make_coastal_dataset(
    out_dir: str,
    *,
    n_train_files: int = 2,
    n_test_files: int = 1,
    frames_per_file: int = 48,
    h: int = 64,
    w: int = 64,
    seed: int = 0,
    fmt: str = "pt",
) -> str:
    rng = np.random.default_rng(seed)
    for sub, n_files in (("train", n_train_files), ("test", n_test_files)):
        mkdir(os.path.join(out_dir, sub))
        for i in range(n_files):
            video = _rain_video(rng, frames_per_file, h, w)[:, None]  # (T,1,H,W)
            save_array(
                os.path.join(out_dir, sub, f"{i:04d}.{fmt}"),
                video.astype(np.float32),
            )
    return out_dir


def make_h5_dataset(
    out_dir: str,
    *,
    frames_train: int = 96,
    frames_test: int = 48,
    h: int = 64,
    w: int = 64,
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    mkdir(os.path.join(out_dir, "train"))
    mkdir(os.path.join(out_dir, "test"))
    save_array(
        os.path.join(out_dir, "train", "train.h5"),
        _rain_video(rng, frames_train, h, w)[:, None].astype(np.float32),
    )
    save_array(
        os.path.join(out_dir, "test", "test_1.h5"),
        _rain_video(rng, frames_test, h, w)[:, None].astype(np.float32),
    )
    return out_dir


def make_kmni_dataset(
    out_dir: str,
    *,
    n_train_files: int = 3,
    n_test_files: int = 1,
    frames_per_file: int = 24,
    n_vertices: int = 6,
    hw: int = 80,
    seed: int = 0,
    fmt: str = "pt",
    regimes: tuple[str, ...] | None = None,
) -> str:
    """``regimes``: when set (e.g. ``("storm", "drizzle")``), file ``i``
    is generated under ``regimes[i % len(regimes)]`` — all vertices of a
    file share the regime (weather is regional) — producing the
    heterogeneous archive the Switch-MoE A/B trains on. Default ``None``
    keeps the original single-regime statistics byte-for-byte."""
    rng = np.random.default_rng(seed)
    for sub, n_files in (("train", n_train_files), ("test", n_test_files)):
        mkdir(os.path.join(out_dir, sub))
        for i in range(n_files):
            regime = regimes[i % len(regimes)] if regimes else None
            video = np.stack(
                [
                    _rain_video(rng, frames_per_file, hw, hw, max_val=254.0,
                                regime=regime)
                    for _ in range(n_vertices)
                ],
                axis=1,
            )  # (T, V, H, W)
            save_array(
                os.path.join(out_dir, sub, f"{i:010d}.{fmt}"),
                np.rint(video).astype(np.int16),
            )
    with open(os.path.join(out_dir, "train", "metadata.json"), "w") as f:
        json.dump({"max": 254, "min": 0}, f)
    return out_dir


def make_arai_dataset(
    out_dir: str,
    *,
    n_files: int = 2,
    frames_per_file: int = 24,
    n_regions: int = 5,
    h: int = 32,
    w: int = 32,
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    meta = {"n_regions": n_regions}
    for sub in ("training", "validation"):
        mkdir(os.path.join(out_dir, sub))
        total = 0
        for i in range(n_files):
            block = np.stack(
                [
                    _rain_video(rng, frames_per_file, h, w)
                    for _ in range(n_regions)
                ],
                axis=1,
            )[:, :, None]  # (T, R, 1, H, W)
            save_array(
                os.path.join(out_dir, sub, f"{i}.pt"), block.astype(np.float32)
            )
            total += frames_per_file
        meta[sub] = {"length": total}
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return out_dir


_DEFAULT_ROOT = "/tmp/extended_gan_tpu_synthetic"


def _keyed(base: str, kwargs: dict) -> str:
    """Cache dir keyed by generation params so differently-shaped synthetic
    datasets never collide."""
    key = "_".join(f"{k}{v}" for k, v in sorted(kwargs.items()))
    return os.path.join(_DEFAULT_ROOT, f"{base}_{key}" if key else base)


def ensure_synthetic_kmni(folder: str | None = None, **kwargs) -> str:
    folder = folder or _keyed("kmni", kwargs)
    if not os.path.isdir(os.path.join(folder, "train")):
        make_kmni_dataset(folder, **kwargs)
    return folder


def ensure_synthetic_h5(folder: str | None = None, **kwargs) -> str:
    folder = folder or _keyed("h5", kwargs)
    if not os.path.isdir(os.path.join(folder, "train")):
        make_h5_dataset(folder, **kwargs)
    return folder


def ensure_synthetic_coastal(folder: str | None = None, **kwargs) -> str:
    folder = folder or _keyed("coastal", kwargs)
    if not os.path.isdir(os.path.join(folder, "train")):
        make_coastal_dataset(folder, **kwargs)
    return folder
