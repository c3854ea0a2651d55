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
