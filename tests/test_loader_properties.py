"""Property tests for loader epoch statistics.

The reference's window/remainder arithmetic determines how many samples an
epoch yields (SURVEY hard-part d); these pin the invariants across batch
sizes and file lengths.
"""

import numpy as np
import pytest

from extended_gan_tpu.data.io import save_array
from extended_gan_tpu.data.streaming import (
    CoastalSeaLoader,
    H5SequenceLoader,
    KmniLoader,
)


def _write_kmni(tmp_path, lengths, v=6, hw=10):
    d = tmp_path / "train"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for i, n in enumerate(lengths):
        save_array(str(d / f"{i:04d}.pt"),
                   rng.randint(0, 255, (n, v, hw, hw)).astype(np.int16))
    return str(d)


@pytest.mark.parametrize("batch_size", [1, 3, 8, 64])
def test_kmni_total_windows_invariant(tmp_path, batch_size):
    """Sum of yielded samples == sum over files of
    (truncate_to_8(len) - 7) windows, for every batch size."""
    lengths = [8, 9, 16, 23, 7]  # includes a too-short file (7 -> 0)
    folder = _write_kmni(tmp_path, lengths)
    expected = sum(max((n // 8) * 8 - 8 + 1, 0) for n in lengths)
    loader = KmniLoader(batch_size, folder, shuffle=False)
    total = sum(len(x) for x, y in loader)
    assert total == expected


@pytest.mark.parametrize("use_native", [True, False])
def test_kmni_native_and_python_same_counts(tmp_path, use_native):
    folder = _write_kmni(tmp_path, [20, 11])
    loader = KmniLoader(4, folder, shuffle=False, use_native=use_native)
    counts = [len(x) for x, _ in loader]
    # 20 -> trunc 16 -> 9 windows; 11 -> trunc 8 -> 1 window
    assert sum(counts) == 10


def test_coastal_windows_per_file(tmp_path):
    d = tmp_path / "train"
    d.mkdir(parents=True)
    rng = np.random.RandomState(1)
    save_array(str(d / "a.pt"), rng.rand(19, 1, 8, 8).astype(np.float32))
    # the reference's truncation is a precedence no-op (data_loader.py:45),
    # so all 19 - 8 + 1 = 12 stride-1 windows are used
    loader = CoastalSeaLoader(str(d), 4, crop=None, shuffle=False)
    total = sum(len(x) for x, _ in loader)
    assert total == 12


def test_h5_xy_never_overlap(tmp_path):
    d = tmp_path / "train"
    d.mkdir(parents=True)
    ramp = np.arange(40, dtype=np.float32)[:, None, None, None] * np.ones(
        (1, 1, 4, 4), np.float32)
    save_array(str(d / "a.h5"), ramp)
    loader = H5SequenceLoader(str(d), 8, crop=None, in_seq_len=4,
                              out_seq_len=4, shuffle=False)
    for x, y in loader:
        # y frames strictly follow x frames within each window
        assert (y[:, 0, 0, 0, 0] - x[:, -1, 0, 0, 0] == 1).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coastal_epoch_count_invariant_random_lengths(tmp_path, seed):
    """Property: for ANY mix of file lengths (short files included), the
    epoch yields exactly sum(max(len_i - 2*seq + 1, 0)) samples at every
    batch size — short files skip, nothing else drops."""
    from extended_gan_tpu.data.io import save_array
    from extended_gan_tpu.data.streaming import CoastalSeaLoader

    rng = np.random.RandomState(seed)
    d = tmp_path / f"coastal{seed}"
    d.mkdir()
    lengths = rng.randint(2, 30, size=7)
    for i, n in enumerate(lengths):
        save_array(str(d / f"{i:02d}.pt"),
                   rng.rand(n, 1, 8, 8).astype(np.float32))
    expected = int(sum(max(n - 8 + 1, 0) for n in lengths))
    for bs in (1, 3, 16):
        loader = CoastalSeaLoader(str(d), bs, crop=8, shuffle=False,
                                  seq_len=4)
        got = sum(len(x) for x, _y in loader)
        assert got == expected, (lengths, bs, got, expected)
