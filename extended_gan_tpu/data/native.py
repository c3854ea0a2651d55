"""ctypes bindings for the native input-pipeline core (native/egt_native.cpp).

Compiled on demand with g++ into a content-hashed .so under
~/.cache/egt_native/ (no pip, no pybind11). Every entry point has a pure
numpy fallback, so the framework works without a toolchain; the native path
removes the GIL + extra passes from the per-batch host work.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "egt_native.cpp",
)
_CACHE_DIR = os.path.expanduser(
    os.environ.get("EGT_NATIVE_CACHE", "~/.cache/egt_native")
)
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build() -> str | None:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"egt_native_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except (subprocess.SubprocessError, OSError) as e:
        print(f"[egt_native] build failed ({e}); using numpy fallback")
        return None


def get_lib() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("EGT_NATIVE", "1") == "0":
        _lib_failed = True
        return None
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _build()
        if so is None:
            _lib_failed = True
            return None
        lib = ctypes.CDLL(so)
        lib.kmni_make_batch.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            _f32p, _f32p,
        ]
        lib.kmni_make_batch.restype = None
        lib.kmni_make_batch_merged.argtypes = list(
            lib.kmni_make_batch.argtypes
        )
        lib.kmni_make_batch_merged.restype = None
        lib.window_gather.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _i64p, ctypes.c_int64,
            ctypes.c_int64, _f32p,
        ]
        lib.window_gather.restype = None
        lib.minmax_normalize.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ]
        lib.minmax_normalize.restype = None
        lib.egt_native_abi_version.restype = ctypes.c_int
        assert lib.egt_native_abi_version() == 2
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------------
# High-level entry points (native with numpy fallback)
# --------------------------------------------------------------------------
def kmni_make_batch(
    video: np.ndarray,
    starts: np.ndarray,
    *,
    steps: int = 4,
    crop: int | tuple[int, int] | None = None,
    max_value: float = 254.0,
    power: float = 1.0,
):
    """Fused window-gather + normalize + (T,V,H,W)->(B,H,W,S,V) transform.

    video: (T, V, H, W) raw float32; starts: (n,) window start frames.
    ``crop`` is a square int or an (h, w) pair. Returns (x, y) each
    (n, crop_h, crop_w, steps, V) float32 normalized. Also serves the ARAI
    loader ((N, R, H, W) region blocks -> (B, H, W, T, R), max_value=1).
    """
    video = np.ascontiguousarray(video, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    t, v, h, w = video.shape
    if crop is None:
        ch, cw = h, w
    elif isinstance(crop, tuple):
        ch, cw = crop
    else:
        ch = cw = crop
    ch, cw = min(ch, h), min(cw, w)
    n = len(starts)
    lib = get_lib()
    if lib is not None:
        x = np.empty((n, ch, cw, steps, v), np.float32)
        y = np.empty((n, ch, cw, steps, v), np.float32)
        lib.kmni_make_batch(
            video, t, v, h, w, starts, n, steps, ch, cw,
            np.float32(1.0 / max_value), np.float32(power), x, y,
        )
        return x, y

    # numpy fallback — identical math
    norm = (video / max_value) ** power if power != 1.0 else video / max_value
    idx = starts[:, None] + np.arange(2 * steps)[None, :]
    wins = norm[idx]  # (n, 2S, V, H, W)
    wins = wins[:, :, :, :ch, :cw].transpose(0, 3, 4, 1, 2)  # (n,H,W,2S,V)
    return (
        np.ascontiguousarray(wins[:, :, :, :steps]),
        np.ascontiguousarray(wins[:, :, :, steps:]),
    )


def kmni_make_batch_merged(
    video: np.ndarray,
    starts: np.ndarray,
    *,
    steps: int = 4,
    crop: int | None = None,
    max_value: float = 254.0,
    power: float = 1.0,
):
    """merge_nodes mosaic batches: (T, V, H, W) raw video -> (x, y) each
    (n, steps, 2*crop, 3*crop), vertex pairs (0,1),(1,2),(2,3) tiled
    2 high x 3 wide (reference kmni_data_loader.py:96-106 layout)."""
    video = np.ascontiguousarray(video, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    t, v, h, w = video.shape
    if v < 4:
        # the mosaic reads vertex pairs up to index 3; the C kernel would
        # read out of bounds (the numpy fallback merely raises IndexError)
        raise ValueError(
            f"merge_nodes needs >= 4 vertices for the 2x3 mosaic, got {v}"
        )
    ch = cw = crop if crop is not None else h
    ch, cw = min(ch, h), min(cw, w)
    n = len(starts)
    lib = get_lib()
    if lib is not None:
        x = np.empty((n, steps, 2 * ch, 3 * cw), np.float32)
        y = np.empty((n, steps, 2 * ch, 3 * cw), np.float32)
        lib.kmni_make_batch_merged(
            video, t, v, h, w, starts, n, steps, ch, cw,
            np.float32(1.0 / max_value), np.float32(power), x, y,
        )
        return x, y

    # numpy fallback — identical math and layout
    norm = (video / max_value) ** power if power != 1.0 else video / max_value
    idx = starts[:, None] + np.arange(2 * steps)[None, :]
    wins = norm[idx][:, :, :, :ch, :cw]  # (n, 2S, V, ch, cw)
    mosaic = np.concatenate(
        [
            np.concatenate((wins[:, :, i], wins[:, :, i + 1]), axis=2)
            for i in range(3)
        ],
        axis=3,
    )  # (n, 2S, 2ch, 3cw)
    return (
        np.ascontiguousarray(mosaic[:, :steps]),
        np.ascontiguousarray(mosaic[:, steps:]),
    )


def window_gather(frames: np.ndarray, starts: np.ndarray, window: int):
    """(N, ...) frames + starts -> contiguous (n, window, ...) batch."""
    frames = np.ascontiguousarray(frames, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    n = len(starts)
    feat = int(np.prod(frames.shape[1:]))
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, window) + frames.shape[1:], np.float32)
        lib.window_gather(
            frames.reshape(len(frames), feat), len(frames), feat, starts, n,
            window, out.reshape(n, window, feat),
        )
        return out
    idx = starts[:, None] + np.arange(window)[None, :]
    return np.ascontiguousarray(frames[idx])


def minmax_normalize(data: np.ndarray) -> np.ndarray:
    """(x - min) / (max - min) over the whole array, as float32.

    Native in-place threaded loop when the core is built (used by the
    coastal-sea preprocessor on multi-GB NetCDF dumps); numpy fallback
    otherwise. Constant arrays (max == min) return zeros like the numpy
    expression would return NaN — callers prefer the defined result.
    """
    lo = float(np.min(data))
    hi = float(np.max(data))
    if hi == lo:
        return np.zeros_like(data, dtype=np.float32)
    out = np.ascontiguousarray(data, np.float32).copy()
    lib = get_lib()
    if lib is not None:
        lib.minmax_normalize(out, out.size, np.float32(lo), np.float32(hi))
        return out
    return (out - lo) / (hi - lo)
