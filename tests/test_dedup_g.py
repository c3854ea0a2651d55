"""dedup_g mode: single generator forward via jax.vjp.

``dedup_g=True`` computes the fake batch ONCE under jax.vjp and pulls
the generator gradient back through that captured forward instead of
re-tracing G inside step 5's value_and_grad (see
extended_gan_tpu/train/dcgan_trainer.py). The recomputed forward it
replaces used the same params, batch stats, and dropout key, and the
chain rule composition is unchanged — so unlike fused_disc this mode
carries NO semantic deviation: with the real BN+dropout models the
fused step must match the default body exactly.
"""

import pytest
import jax
import numpy as np

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import (
    make_dcgan_megastep,
    make_dcgan_train_step,
)

PARAMS = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 0}


def _batch(b=8):
    rng = np.random.RandomState(0)
    x = rng.rand(b, 64, 64, 4).astype(np.float32)
    y = rng.rand(b, 64, 64, 4).astype(np.float32)
    mask = np.concatenate(
        [np.ones(b - 2, np.float32), np.zeros(2, np.float32)])
    return x, y, mask


def _assert_states_close(sa, sb, rtol=0.0, atol=0.0):
    for net_a, net_b in ((sa.g, sb.g), (sa.fd, sb.fd), (sa.td, sb.td)):
        for la, lb in zip(jax.tree_util.tree_leaves(net_a.params),
                          jax.tree_util.tree_leaves(net_b.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=rtol, atol=atol)
        for la, lb in zip(jax.tree_util.tree_leaves(net_a.batch_stats),
                          jax.tree_util.tree_leaves(net_b.batch_stats)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=rtol, atol=atol)


@pytest.mark.slow
def test_dedup_g_matches_default_with_bn_and_dropout():
    """Real models (BatchNorm + dropout LIVE): dedup_g must be exact —
    it is a re-expression of the same program, not an approximation."""
    models, txs, states_a, _ = build_dcgan(PARAMS)
    _, _, states_b, _ = build_dcgan(PARAMS)
    step_a = make_dcgan_train_step(*models, *txs)
    step_b = make_dcgan_train_step(*models, *txs, dedup_g=True)

    x, y, mask = _batch()
    keys = KeySeq(5)
    logs_a = logs_b = None
    for _ in range(3):
        k = keys.next()
        states_a, logs_a = step_a(states_a, x, y, mask, k)
        states_b, logs_b = step_b(states_b, x, y, mask, k)

    for name in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(float(logs_a[name]),
                                   float(logs_b[name]),
                                   rtol=1e-6, atol=1e-7)
    # CPU XLA executes the identical math identically -> bitwise equal
    _assert_states_close(states_a, states_b)


@pytest.mark.slow
def test_dedup_g_composes_with_fused_disc():
    """dedup_g + fused_disc: runs, and matches fused_disc alone exactly
    (dedup_g changes no math regardless of the D-pass layout)."""
    models, txs, states_a, _ = build_dcgan(PARAMS)
    _, _, states_b, _ = build_dcgan(PARAMS)
    step_a = make_dcgan_train_step(*models, *txs, fused_disc=True)
    step_b = make_dcgan_train_step(*models, *txs, fused_disc=True,
                                   dedup_g=True)

    x, y, mask = _batch()
    keys = KeySeq(9)
    for _ in range(2):
        k = keys.next()
        states_a, _ = step_a(states_a, x, y, mask, k)
        states_b, _ = step_b(states_b, x, y, mask, k)
    _assert_states_close(states_a, states_b)


def test_dedup_g_megastep_matches_single_steps():
    """megastep(dedup_g=True) == K dedup single steps (same rng seq).

    Uses the stat-free tiny models (as test_fused_disc does): with the
    real BN+dropout nets the scan body compiles to a float-reassociated
    program whose ~1e-7 per-step drift is amplified by the adversarial
    dynamics, which would test XLA scheduling noise, not dedup_g."""
    from tests.test_fused_disc import _tiny_states

    from extended_gan_tpu.train.optim import adam

    txs = (adam(2e-4, b1=0.5), adam(2e-4, b1=0.5), adam(2e-4, b1=0.5))
    models, states_a = _tiny_states(KeySeq(0), txs)
    _, states_b = _tiny_states(KeySeq(0), txs)
    step = make_dcgan_train_step(*models, *txs, dedup_g=True)
    mega = make_dcgan_megastep(*models, *txs, dedup_g=True)

    k = 3
    rng = np.random.RandomState(2)
    xs = rng.rand(k, 4, 16, 16, 4).astype(np.float32)
    ys = rng.rand(k, 4, 16, 16, 4).astype(np.float32)
    masks = np.ones((k, 4), np.float32)
    keys = KeySeq(11)
    rngs = np.stack([np.asarray(keys.next()) for _ in range(k)])

    for i in range(k):
        states_a, _ = step(states_a, xs[i], ys[i], masks[i], rngs[i])
    states_b, _ = mega(states_b, xs, ys, masks, rngs)
    _assert_states_close(states_a, states_b, rtol=2e-5, atol=2e-6)
