import numpy as np
import jax.numpy as jnp

from extended_gan_tpu.utils import (
    IncrementalTuple,
    MetricsManager,
    accuracy_criterion,
    get_metrics,
    thresholded_metrics,
)


def test_incremental_tuple_basic():
    it = IncrementalTuple()
    it += IncrementalTuple(3.0, 4.0)
    it += IncrementalTuple(1.0, 4.0)
    assert it.item() == 0.5
    rec = it.reciprocal()
    assert rec.item() == 0.5
    # asymmetric data so complement != identity (0.5/0.5 couldn't tell
    # reciprocal() from a no-op)
    it2 = IncrementalTuple(1.0, 4.0)
    assert it2.item() == 0.25
    assert it2.reciprocal().item() == 0.75


def test_metrics_manager_mse():
    mm = MetricsManager(("mse",), prefix="train")
    y = np.zeros((2, 3), np.float32)
    y_hat = np.ones((2, 3), np.float32)
    mm.update(y, y_hat)
    mm.update(y, y)  # zero error batch
    # total squared error = 6, total elements = 12
    assert abs(mm.results()["train_mse"] - 0.5) < 1e-7


def test_metrics_manager_accuracy_denominator_quirk():
    # Reference divides by y[0].numel() per update, not the batch size.
    mm = MetricsManager(("accuracy",), prefix="d")
    y = np.array([0.0, 0.0, 1.0, 1.0])  # binarized: y<0.5 -> [T,T,F,F]
    y_hat = np.array([0.0, 1.0, 1.0, 1.0])  # -> [T,F,F,F]
    mm.update(y, y_hat)
    # matches = 3 (idx 0,2,3), denom = y[0].numel() = 1
    assert mm.results()["d_accuracy"] == 3.0


def test_metrics_manager_precision_recall():
    mm = MetricsManager(("precision", "recall"), prefix="p")
    # After `< 0.5` binarize: y -> [1,1,0,0], y_hat -> [1,0,0,1]
    y = np.array([0.0, 0.0, 1.0, 1.0])
    y_hat = np.array([0.0, 1.0, 1.0, 0.0])
    mm.update(y, y_hat)
    res = mm.results()
    # TP=1 (idx0), FP=1 (idx3), FN=1 (idx1)
    assert res["p_precision"] == 0.5
    assert res["p_recall"] == 0.5


def test_accuracy_criterion_rounding():
    a = np.array([0.4, 0.6, 0.9])
    b = np.array([0.0, 1.0, 1.0])
    it = accuracy_criterion(a, b)
    assert it.item() == 1.0  # all three round-match; denom = 3


def test_thresholded_metrics_scaling():
    # conv-GAT precision/recall are scaled by batch length (utils.py:154-167)
    y = np.array([[0.1, 0.9], [0.9, 0.1]], np.float32)
    y_hat = np.array([[0.1, 0.9], [0.1, 0.9]], np.float32)
    acc, prec, rec = get_metrics(y, y_hat, 0.5)
    # binarized y=[[0,1],[1,0]], y_hat=[[0,1],[0,1]]
    # matches=2 of 4; acc = 2 / y[0].numel()=2 -> 1.0
    assert acc == 1.0
    # TP=1, FP=1 -> prec = 0.5 * len(y)=2 -> 1.0
    assert prec == 1.0
    # TP=1, FN=1 -> rec = 0.5 * 2 = 1.0
    assert rec == 1.0


def test_thresholded_metrics_jittable():
    import jax

    f = jax.jit(thresholded_metrics, static_argnames=())
    y = jnp.ones((4, 8), jnp.float32)
    out = f(y, y, 0.5)
    assert out.shape == (3,)
