"""Hand-computed parity check of the DCGAN eval metric semantics.

The reference's eval quirks (MetricsManager `< 0.5` binarize polarity,
per-update accuracy denominators — dcgan/train.py:26-77, metrics.py:58-84)
produce specific numbers for known inputs; this pins our jitted eval step to
a by-hand computation on a tiny deterministic case.
"""

import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import make_dcgan_eval_step
from extended_gan_tpu.utils.metrics import IncrementalTuple, MetricsManager

PARAMS = {"bsize": 4, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 2}


def test_eval_metrics_match_hand_computation():
    models, txs, states, keys = build_dcgan(PARAMS, seed=3)
    eval_step = make_dcgan_eval_step(*models)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 64, 64, 4).astype(np.float32))
    y = jnp.asarray(rng.rand(4, 64, 64, 4).astype(np.float32))
    mask = jnp.ones(4)
    fake, logs = eval_step(states, x, y, mask)
    fake = np.asarray(fake)

    # ---- pred metrics by hand (reference binarize: value < 0.5) ----------
    yb = np.asarray(y) < 0.5
    fb = fake < 0.5
    nd = {k: np.asarray(v) for k, v in logs["pred_nd"].items()}
    # accuracy: matches over whole batch / elements of ONE sample
    assert nd["accuracy"][0] == (yb == fb).sum()
    assert nd["accuracy"][1] == y[0].size
    # precision / recall with "positive" == binarized True
    tp = ((fb == 1) & (yb == 1)).sum()
    fp = ((fb == 1) & (yb == 0)).sum()
    fn = ((fb == 0) & (yb == 1)).sum()
    np.testing.assert_allclose(nd["precision"], [tp, tp + fp])
    np.testing.assert_allclose(nd["recall"], [tp, tp + fn])
    # mse
    np.testing.assert_allclose(
        nd["mse"][0], ((fake - np.asarray(y)) ** 2).sum(), rtol=1e-5)
    assert nd["mse"][1] == np.asarray(y).size

    # ---- discriminator accuracy denominators: 1 per update, 2 updates ----
    assert float(logs["fd_acc_nd"][1]) == 2.0
    assert float(logs["td_acc_nd"][1]) == 2.0

    # ---- MetricsManager aggregation equals the host-side manager ---------
    mm = MetricsManager(("accuracy", "precision", "recall", "mse"),
                        prefix="pred")
    mm.update_from_nd(nd)
    res = mm.results()
    np.testing.assert_allclose(
        res["pred_mse"], nd["mse"][0] / nd["mse"][1], rtol=1e-6)
