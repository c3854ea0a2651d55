import numpy as np

from extended_gan_tpu.data.io import save_array
from extended_gan_tpu.preprocess.kmni import get_z_score_normalizing_constants


def test_z_score_constants(tmp_path):
    d = tmp_path / "train"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    a = rng.rand(10, 2, 4, 4).astype(np.float32)
    b = rng.rand(6, 2, 4, 4).astype(np.float32)
    save_array(str(d / "0.pt"), a)
    save_array(str(d / "1.pt"), b)
    result = get_z_score_normalizing_constants(str(tmp_path))
    cat = np.concatenate([a, b])
    np.testing.assert_allclose(result["mean"], cat.mean(axis=0), rtol=1e-5)
    np.testing.assert_allclose(result["var"], cat.var(axis=0, ddof=1),
                               rtol=1e-4)
    assert (tmp_path / "metadata.npz").exists()
