"""Native C++ input-pipeline core vs numpy fallback."""

import numpy as np
import pytest

from extended_gan_tpu.data import native
from extended_gan_tpu.data.synthetic import make_kmni_dataset


def test_native_library_builds():
    assert native.available(), "g++ build of native/egt_native.cpp failed"


def test_kmni_make_batch_native_matches_numpy():
    rng = np.random.RandomState(0)
    video = rng.randint(0, 255, size=(16, 6, 12, 12)).astype(np.float32)
    starts = np.array([0, 3, 7], np.int64)
    x_n, y_n = native.kmni_make_batch(video, starts, steps=4, crop=10,
                                      max_value=254.0, power=2.0)
    # force the numpy fallback
    lib, native._lib, native._lib_failed = native._lib, None, True
    try:
        x_p, y_p = native.kmni_make_batch(video, starts, steps=4, crop=10,
                                          max_value=254.0, power=2.0)
    finally:
        native._lib, native._lib_failed = lib, False
    np.testing.assert_allclose(x_n, x_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(y_n, y_p, rtol=1e-5, atol=1e-6)


def test_window_gather_native_matches_numpy():
    rng = np.random.RandomState(1)
    frames = rng.randn(20, 3, 4).astype(np.float32)
    starts = np.array([0, 5, 11], np.int64)
    out_n = native.window_gather(frames, starts, 6)
    lib, native._lib, native._lib_failed = native._lib, None, True
    try:
        out_p = native.window_gather(frames, starts, 6)
    finally:
        native._lib, native._lib_failed = lib, False
    np.testing.assert_array_equal(out_n, out_p)
    assert out_n.shape == (3, 6, 3, 4)


def test_kmni_loader_native_matches_python_path(tmp_path):
    from extended_gan_tpu.data.streaming import KmniLoader

    make_kmni_dataset(str(tmp_path), n_train_files=2, n_test_files=1,
                      frames_per_file=20, n_vertices=6, hw=16)
    a = KmniLoader(4, str(tmp_path / "train"), shuffle=False, crop=12,
                   power=1.5, use_native=True, seed=1)
    b = KmniLoader(4, str(tmp_path / "train"), shuffle=False, crop=12,
                   power=1.5, use_native=False, seed=1)
    n = 0
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_allclose(xa, xb, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)
        n += 1
    assert n >= 3
