import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.utils.metrics import nowcast_scores


def test_nowcast_scores_hand_computed():
    # y mask:    [1, 1, 0, 0]   (threshold 0.5)
    # pred mask: [1, 0, 1, 0]
    y = jnp.array([0.9, 0.8, 0.1, 0.2])
    p = jnp.array([0.7, 0.3, 0.9, 0.1])
    s = {k: float(v) for k, v in nowcast_scores(y, p, 0.5).items()}
    # TP=1, FP=1, FN=1
    assert abs(s["csi"] - 1 / 3) < 1e-6
    assert abs(s["far"] - 0.5) < 1e-6
    # precision = recall = 0.5 -> f1 = 0.5
    assert abs(s["f1"] - 0.5) < 1e-6


def test_nowcast_scores_perfect_prediction():
    y = jnp.array([[0.9, 0.1], [0.2, 0.8]])
    s = {k: float(v) for k, v in nowcast_scores(y, y, 0.5).items()}
    assert s["f1"] == 1.0 and s["csi"] == 1.0 and s["far"] == 0.0


def test_nowcast_scores_masked():
    y = jnp.array([[0.9], [0.1]])      # sample 0 rain, sample 1 dry
    p = jnp.array([[0.1], [0.9]])      # both wrong
    mask = jnp.array([1.0, 0.0])       # only sample 0 counts
    s = nowcast_scores(y, p, 0.5, mask=mask)
    # TP=0, FN=1, FP=0 -> csi = 0
    assert float(s["csi"]) == 0.0
    assert np.isnan(float(s["far"]))  # no positive predictions


def test_nowcast_scores_all_dry_is_nan():
    y = jnp.zeros((2, 3))
    s = nowcast_scores(y, y, 0.5)
    assert np.isnan(float(s["f1"]))
    assert np.isnan(float(s["csi"]))
