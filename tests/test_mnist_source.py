import gzip
import os
import struct

import numpy as np

from extended_gan_tpu.data.mnist import load_images, synthetic_digits


def _write_idx(path, images: np.ndarray, gz=False):
    n, r, c = images.shape
    header = struct.pack(">IIII", 2051, n, r, c)
    data = header + images.astype(np.uint8).tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(data)


def test_load_images_from_idx(tmp_path):
    imgs = (np.arange(5 * 28 * 28) % 256).reshape(5, 28, 28).astype(np.uint8)
    _write_idx(str(tmp_path / "train-images-idx3-ubyte"), imgs)
    x = load_images(str(tmp_path), img_size=28)
    assert x.shape == (5, 1, 28, 28)
    assert x.min() >= -1.0 and x.max() <= 1.0
    # value round-trip: pixel 255 -> 1.0, pixel 0 -> -1.0
    np.testing.assert_allclose(x[0, 0, 0, 0], -1.0)


def test_load_images_from_gz_with_resize(tmp_path):
    imgs = np.zeros((3, 28, 28), np.uint8)
    os.makedirs(tmp_path / "MNIST" / "raw")
    _write_idx(str(tmp_path / "MNIST" / "raw" / "train-images-idx3-ubyte.gz"),
               imgs, gz=True)
    x = load_images(str(tmp_path), img_size=14)
    assert x.shape == (3, 1, 14, 14)


def test_synthetic_digits_deterministic():
    a = synthetic_digits(4, size=16, seed=3)
    b = synthetic_digits(4, size=16, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 16, 16)
    assert a.dtype == np.uint8
