import numpy as np

from extended_gan_tpu.data.streaming import KmniLoader
from extended_gan_tpu.data.synthetic import make_kmni_dataset


def _dataset(tmp_path):
    make_kmni_dataset(str(tmp_path), n_train_files=3, n_test_files=1,
                      frames_per_file=20, n_vertices=6, hw=12)
    return str(tmp_path / "train")


def test_global_mode_yields_same_sample_multiset(tmp_path):
    folder = _dataset(tmp_path)
    batch_loader = KmniLoader(8, folder, shuffle=False, crop=12)
    global_loader = KmniLoader(8, folder, shuffle=True, crop=12,
                               shuffle_mode="global", seed=5)

    def collect(loader):
        samples = []
        for x, _y in loader:
            samples.extend(np.asarray(x).reshape(len(x), -1))
        return samples

    a = collect(batch_loader)
    b = collect(global_loader)
    assert len(a) == len(b)
    # same multiset of samples regardless of ordering
    a_sorted = np.sort(np.round(np.stack(a), 5).sum(axis=1))
    b_sorted = np.sort(np.round(np.stack(b), 5).sum(axis=1))
    np.testing.assert_allclose(a_sorted, b_sorted, rtol=1e-5)


def test_global_mode_mixes_files_within_batches(tmp_path):
    folder = _dataset(tmp_path)
    loader = KmniLoader(16, folder, shuffle=True, crop=12,
                        shuffle_mode="global", seed=0)
    # with 3 files x 13 windows and batch 16, a shuffled batch must draw
    # from more than one file; verify via the internal order bookkeeping
    first = loader._order[:16]
    assert len(np.unique(first[:, 0])) > 1
    x, y = next(loader)
    assert x.shape == (16, 12, 12, 4, 6)


def test_global_mode_deterministic_per_seed(tmp_path):
    folder = _dataset(tmp_path)
    a = KmniLoader(4, folder, shuffle=True, crop=12,
                   shuffle_mode="global", seed=3)
    b = KmniLoader(4, folder, shuffle=True, crop=12,
                   shuffle_mode="global", seed=3)
    xa, _ = next(a)
    xb, _ = next(b)
    np.testing.assert_array_equal(xa, xb)


def test_global_mode_header_only_init_and_one_decode_per_file(tmp_path):
    """VERDICT item 8: construction reads headers only; with the pooled
    locality-aware shuffle each file decodes exactly once per epoch."""
    folder = _dataset(tmp_path)
    loader = KmniLoader(8, folder, shuffle=True, crop=12,
                        shuffle_mode="global", seed=1, shuffle_pool=2)
    assert loader.n_decodes == 0  # init decoded nothing
    for _ in loader:
        pass
    assert loader.n_decodes == len(loader.files), (
        loader.n_decodes, len(loader.files))


def test_global_pooled_same_sample_multiset(tmp_path):
    """Pooling constrains ordering, never the epoch's sample multiset."""
    folder = _dataset(tmp_path)
    batch_loader = KmniLoader(8, folder, shuffle=False, crop=12)
    pooled = KmniLoader(8, folder, shuffle=True, crop=12,
                        shuffle_mode="global", seed=5, shuffle_pool=2)

    def collect(loader):
        return [np.asarray(x).reshape(len(x), -1)
                for x, _y in loader]

    a = np.concatenate(collect(batch_loader))
    b = np.concatenate(collect(pooled))
    assert len(a) == len(b)
    np.testing.assert_allclose(
        np.sort(np.round(a, 5).sum(axis=1)),
        np.sort(np.round(b, 5).sum(axis=1)), rtol=1e-5)


def test_global_mode_supports_merge_nodes(tmp_path):
    folder = _dataset(tmp_path)
    loader = KmniLoader(8, folder, shuffle=True, crop=10,
                        shuffle_mode="global", seed=2, merge_nodes=True)
    x, y = next(loader)
    assert x.shape == (8, 4, 20, 30)  # (B, T, 2*crop, 3*crop)
    assert y.shape == (8, 4, 20, 30)
    assert float(x.max()) <= 1.0


def test_merged_native_matches_python_path(tmp_path):
    """merge_nodes mosaic: native C++ batch == the python _segmentify path."""
    folder = _dataset(tmp_path)
    native = KmniLoader(6, folder, shuffle=False, crop=10, merge_nodes=True,
                        use_native=True)
    python = KmniLoader(6, folder, shuffle=False, crop=10, merge_nodes=True,
                        use_native=False)
    n_batches = 0
    for (xn, yn), (xp, yp) in zip(native, python):
        np.testing.assert_allclose(xn, xp, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(yn, yp, rtol=1e-6, atol=1e-7)
        n_batches += 1
    assert n_batches > 0


def test_fully_random_mode_bounds_decoded_cache(tmp_path):
    """shuffle_pool=0 (fully random) must NOT cache the whole decoded
    archive: host RAM is capped at MAX_CACHED_VIDEOS decoded files, paying
    re-decodes instead (round-2 review finding)."""
    make_kmni_dataset(str(tmp_path), n_train_files=20, n_test_files=1,
                      frames_per_file=16, n_vertices=6, hw=8)
    folder = str(tmp_path / "train")
    loader = KmniLoader(8, folder, shuffle=True, crop=8,
                        shuffle_mode="global", seed=2, shuffle_pool=0)
    peak = 0
    for _ in loader:
        peak = max(peak, len(loader._video_cache))
    assert peak <= KmniLoader.MAX_CACHED_VIDEOS
    assert loader.n_decodes >= len(loader.files)  # re-decodes are expected
