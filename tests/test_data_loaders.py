import json
import os

import numpy as np
import pytest

from extended_gan_tpu.data.streaming import (
    AraiLoader,
    CoastalSeaLoader,
    H5SequenceLoader,
    KmniLoader,
    Prefetcher,
    get_arai_loaders,
    get_coastal_loaders,
    get_h5_loaders,
    get_kmni_loaders,
    get_loaders,
)
from extended_gan_tpu.data.synthetic import (
    make_arai_dataset,
    make_coastal_dataset,
    make_h5_dataset,
    make_kmni_dataset,
)
from extended_gan_tpu.data.windowing import sliding_windows


def test_sliding_windows_values():
    x = np.arange(10)
    w = sliding_windows(x, 4)
    assert w.shape == (7, 4)
    np.testing.assert_array_equal(w[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(w[-1], [6, 7, 8, 9])


def test_coastal_loader_shapes_and_xy_distinct(tmp_path):
    make_coastal_dataset(str(tmp_path), frames_per_file=24, h=16, w=16,
                         n_train_files=2, n_test_files=1)
    train, test = get_coastal_loaders(str(tmp_path), 8, 4, crop=12)
    x, y = next(train)
    assert x.shape == (8, 4, 1, 12, 12)
    assert y.shape == (8, 4, 1, 12, 12)
    assert not np.array_equal(x, y)
    # drains without error, yields only complete batches or short tail
    n = 1
    for x, y in train:
        assert x.shape[0] <= 8 and x.shape[0] == y.shape[0]
        n += 1
    assert n > 1


def test_h5_loader_window_semantics(tmp_path):
    make_h5_dataset(str(tmp_path), frames_train=40, frames_test=24, h=16, w=16)
    train, test = get_h5_loaders(str(tmp_path), 8, 4, crop=16,
                                 in_seq_len=4, out_seq_len=4)
    x, y = next(train)
    assert x.shape == (8, 4, 1, 16, 16)
    assert y.shape == (8, 4, 1, 16, 16)
    total = x.shape[0]
    for x, y in train:
        total += x.shape[0]
    # stride-1 windows, buffer drops batch_size frames per batch:
    # 40 frames -> 33+... window counts 8, 8, 8, 8, 1 as the buffer
    # shrinks 40 -> 32 -> 24 -> 16 -> 8 frames. Exact total pins the
    # window/remainder semantics (a >=8 assertion was vacuous).
    assert total == 33, total


def test_h5_loader_xy_are_consecutive(tmp_path):
    # Use unshuffled loader with ramp data to check x/y continuity.
    from extended_gan_tpu.data.io import save_array

    os.makedirs(tmp_path / "train")
    ramp = np.arange(32, dtype=np.float32)[:, None, None, None] * np.ones(
        (1, 1, 4, 4), np.float32
    )
    save_array(str(tmp_path / "train" / "a.h5"), ramp)
    loader = H5SequenceLoader(str(tmp_path / "train"), 4, crop=None,
                              in_seq_len=4, out_seq_len=4, shuffle=False)
    x, y = next(loader)
    # window starting at 0: x frames 0..3, y frames 4..7
    assert x[0, :, 0, 0, 0].tolist() == [0, 1, 2, 3]
    assert y[0, :, 0, 0, 0].tolist() == [4, 5, 6, 7]
    # window starting at 1
    assert x[1, 0, 0, 0, 0] == 1.0


def test_kmni_loader_layout_and_normalization(tmp_path):
    make_kmni_dataset(str(tmp_path), n_train_files=2, n_test_files=1,
                      frames_per_file=16, n_vertices=6, hw=24)
    train, val, test = get_kmni_loaders(4, 2, str(tmp_path), crop=20)
    x, y = next(train)
    assert x.shape == (4, 20, 20, 4, 6)  # (B, H, W, T, V)
    assert y.shape == (4, 20, 20, 4, 6)
    assert x.max() <= 1.0 and x.min() >= 0.0
    assert train.normalizing_max == 254.0
    assert train.power == 1.0


def test_kmni_loader_power_transform(tmp_path):
    make_kmni_dataset(str(tmp_path), n_train_files=1, n_test_files=1,
                      frames_per_file=16, n_vertices=6, hw=16)
    plain = KmniLoader(4, str(tmp_path / "train"), shuffle=False, power=1.0)
    powered = KmniLoader(4, str(tmp_path / "train"), shuffle=False, power=2.0)
    x1, _ = next(plain)
    x2, _ = next(powered)
    np.testing.assert_allclose(x2, x1**2, rtol=1e-5)


def test_kmni_merge_nodes_mosaic(tmp_path):
    make_kmni_dataset(str(tmp_path), n_train_files=1, n_test_files=1,
                      frames_per_file=16, n_vertices=6, hw=16)
    loader = KmniLoader(2, str(tmp_path / "train"), shuffle=False,
                        merge_nodes=True)
    x, y = next(loader)
    # (B, T, 2H, 3W): vertex pairs tiled 2 high x 3 wide
    assert x.shape == (2, 4, 32, 48)


def test_arai_loader_and_prefetch(tmp_path):
    make_arai_dataset(str(tmp_path), n_files=2, frames_per_file=16,
                      n_regions=5, h=12, w=12)
    train, val, test = get_arai_loaders(4, 2, str(tmp_path),
                                        downsample_size=(8, 8))
    x, y = next(train)
    assert x.shape == (4, 8, 8, 4, 5)  # (B, H, W, T, V)
    assert not np.array_equal(x, y)
    count = 1
    for x, y in train:
        count += 1
    assert count > 2


def test_get_loaders_dispatcher_synthetic(tmp_path):
    train, val, test = get_loaders(
        2, 2, str(tmp_path / "kmni"), dataset="synthetic",
        downsample_size=(16, 16),
    )
    x, y = next(train)
    assert x.shape[1:] == (16, 16, 4, 6)


def test_prefetcher_yields_everything():
    items = [(np.ones(2), np.zeros(2)) for _ in range(5)]
    out = list(Prefetcher(iter(items), depth=2))
    assert len(out) == 5


def test_prefetcher_propagates_errors():
    def gen():
        yield (1, 2)
        raise ValueError("boom")

    p = Prefetcher(gen())
    assert next(p) == (1, 2)
    with pytest.raises(ValueError):
        next(p)


@pytest.mark.parametrize("threaded", [True, False])
def test_prefetcher_threaded_and_inline_identical(threaded):
    """Both placements (background thread on multi-core hosts, inline on
    <=2-core hosts) must preserve ordering, apply `transfer` exactly once
    per item, and propagate mid-stream errors at the right position."""
    def gen():
        for i in range(4):
            yield i
        raise RuntimeError("late")

    seen = []
    p = Prefetcher(gen(), depth=2,
                   transfer=lambda i: seen.append(i) or i * 10,
                   threaded=threaded)
    out = []
    with pytest.raises(RuntimeError):
        for item in p:
            out.append(item)
    assert out == [0, 10, 20, 30]
    assert seen == [0, 1, 2, 3]


def test_arai_native_matches_numpy_path(tmp_path):
    """ARAI native fast path (fused C++ gather) == the numpy/transpose
    path, batch for batch."""
    make_arai_dataset(str(tmp_path), n_files=2, frames_per_file=16,
                      n_regions=3, h=12, w=14)
    import json
    import os

    with open(os.path.join(str(tmp_path), "metadata.json")) as f:
        meta = json.load(f)
    mk = lambda un: AraiLoader(
        4, os.path.join(str(tmp_path), "training"),
        total_length=meta["training"]["length"],
        n_regions=meta["n_regions"], downsample_size=(10, 12),
        use_native=un,
    )
    n = 0
    for (xn, yn), (xp, yp) in zip(mk(True), mk(False)):
        np.testing.assert_allclose(xn, xp, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(yn, yp, rtol=1e-6, atol=1e-7)
        assert xn.shape[1:] == (10, 12, 4, 3)
        n += 1
    assert n > 0


def test_coastal_loader_skips_short_files(tmp_path):
    """A file too short for one window must be skipped, not end the epoch
    (round-2 review: the first short file silently dropped all later
    files)."""
    from extended_gan_tpu.data.io import save_array
    from extended_gan_tpu.data.streaming import CoastalSeaLoader

    rng = np.random.RandomState(0)
    # sorted order: a(long), b(short), c(long)
    save_array(str(tmp_path / "a.pt"),
               rng.rand(19, 1, 8, 8).astype(np.float32))
    save_array(str(tmp_path / "b.pt"),
               rng.rand(5, 1, 8, 8).astype(np.float32))
    save_array(str(tmp_path / "c.pt"),
               rng.rand(19, 1, 8, 8).astype(np.float32))
    loader = CoastalSeaLoader(str(tmp_path), 64, crop=8, shuffle=False,
                              seq_len=4)
    n = sum(len(x) for x, _y in loader)
    assert n == 24, n  # 12 windows from a.pt + 12 from c.pt, none dropped


def test_h5_loader_continues_past_short_file(tmp_path):
    import h5py

    from extended_gan_tpu.data.streaming import H5SequenceLoader

    rng = np.random.RandomState(1)
    for name, frames in (("a.h5", 16), ("b.h5", 5), ("c.h5", 16)):
        with h5py.File(str(tmp_path / name), "w") as f:
            f["default"] = rng.rand(frames, 1, 8, 8).astype(np.float32)
    loader = H5SequenceLoader(str(tmp_path), 64, crop=8,
                              shuffle=False, in_seq_len=4, out_seq_len=4)
    n = sum(len(x) for x, _y in loader)
    # 16-frame files (truncated to 16) give 9 windows each; b.h5 gives 0
    assert n == 18, n


def test_kmni_python_path_skips_short_files(tmp_path):
    """The non-native KmniLoader path crashed (5-D sentinel into a 6-axis
    transpose) on a short file; now it skips it like the native path."""
    from extended_gan_tpu.data.io import save_array
    from extended_gan_tpu.data.streaming import KmniLoader

    rng = np.random.RandomState(2)
    d = tmp_path / "train"
    d.mkdir()
    save_array(str(d / "a.pt"),
               (rng.rand(16, 6, 8, 8) * 254).astype(np.float32))
    save_array(str(d / "b.pt"),
               (rng.rand(4, 6, 8, 8) * 254).astype(np.float32))
    save_array(str(d / "c.pt"),
               (rng.rand(16, 6, 8, 8) * 254).astype(np.float32))
    loader = KmniLoader(64, str(d), shuffle=False, crop=8, use_native=False)
    n = sum(len(x) for x, _y in loader)
    assert n == 18, n  # 9 + 0 + 9 windows


def test_arai_len_matches_iteration(tmp_path):
    from extended_gan_tpu.data.io import save_array
    from extended_gan_tpu.data.streaming import AraiLoader

    rng = np.random.RandomState(3)
    d = tmp_path / "training"
    d.mkdir()
    for i, frames in enumerate((24, 13)):
        save_array(str(d / f"{i}.pt"),
                   rng.rand(frames, 5, 1, 8, 8).astype(np.float32))
    (d / "README.md").write_text("stray file must not crash construction")
    loader = AraiLoader(4, str(d), total_length=37, n_regions=5,
                        time_steps=4, downsample_size=(8, 8))
    batches = sum(1 for _ in loader)
    # file0: 17 windows -> 5 batches; file1: 6 windows -> 2 batches
    assert batches == 7
    assert len(loader) == 7


def test_merge_nodes_rejects_too_few_vertices():
    import pytest

    from extended_gan_tpu.data.native import kmni_make_batch_merged

    video = np.zeros((10, 3, 8, 8), np.float32)
    with pytest.raises(ValueError, match="4 vertices"):
        kmni_make_batch_merged(video, np.zeros(1, np.int64), steps=4)


def test_native_minmax_normalize_matches_numpy():
    from extended_gan_tpu.data.native import minmax_normalize

    rng = np.random.RandomState(4)
    a = (rng.rand(3, 50, 40) * 100 - 30).astype(np.float64)
    got = minmax_normalize(a)
    want = ((a - a.min()) / (a.max() - a.min())).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32
    # constant input: defined zeros, not NaN
    z = minmax_normalize(np.full((4, 4), 7.0))
    assert not np.isnan(z).any() and (z == 0).all()


def test_arai_shuffle_reorders_files_per_seed(tmp_path):
    from extended_gan_tpu.data.io import save_array
    from extended_gan_tpu.data.streaming import AraiLoader

    rng = np.random.RandomState(5)
    d = tmp_path / "training"
    d.mkdir()
    blocks = [rng.rand(12, 2, 1, 6, 6).astype(np.float32) for _ in range(4)]
    for i, b in enumerate(blocks):
        save_array(str(d / f"{i}.pt"), b)

    def first_batch(seed, shuffle):
        loader = AraiLoader(4, str(d), total_length=48, n_regions=2,
                            time_steps=4, downsample_size=(6, 6),
                            shuffle=shuffle, seed=seed)
        x, _y = next(iter(loader))
        return np.asarray(x)

    a = first_batch(1, True)
    b = first_batch(2, True)
    c = first_batch(1, True)
    np.testing.assert_array_equal(a, c)   # deterministic per seed
    assert not np.array_equal(a, b)       # different seed, different order
    plain = first_batch(0, False)
    assert plain.shape == a.shape
