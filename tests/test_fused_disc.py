"""fused_disc mode: doubled-batch discriminator passes.

The opt-in ``fused_disc=True`` step batches each discriminator's real and
fake passes into one 2B forward/backward (see
extended_gan_tpu/train/dcgan_trainer.py). Its only semantic deviations from
the reference's sequential passes (dcgan/train.py:109-139) live inside
BatchNorm batch statistics and the dropout mask draw — so with
BatchNorm and dropout disabled the fused and sequential bodies must
produce identical updates, and with the real models it must still train.
"""

import pytest
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.models.dcgan import ConvBlock
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import (
    GANStates,
    make_dcgan_megastep,
    make_dcgan_train_step,
)
from extended_gan_tpu.train.optim import adam
from extended_gan_tpu.train.state import create_net_state

PARAMS = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 0}


class _NoBnG(nn.Module):
    """Tiny stat-free generator: conv -> sigmoid, 4 frame channels."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        return ConvBlock(4, 3, padding="SAME", batchnorm=False, dropout=0.0,
                         act="sigmoid")(x, train=train)


class _NoBnD(nn.Module):
    """Tiny stat-free discriminator: conv -> pool -> dense -> sigmoid."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = ConvBlock(8, 4, stride=2, padding=1, batchnorm=False,
                      dropout=0.0, act="leaky_relu")(x, train=train)
        x = x.mean(axis=(1, 2))
        return nn.sigmoid(nn.Dense(1)(x)).reshape(-1)


def _tiny_states(keys: KeySeq, txs):
    g_tx, fd_tx, td_tx = txs
    g, fd, td = _NoBnG(), _NoBnD(), _NoBnD()
    sample = jnp.zeros((2, 16, 16, 4), jnp.float32)
    sample2 = jnp.zeros((2, 16, 16, 8), jnp.float32)
    states = GANStates(
        g=create_net_state(g, g_tx, keys.next(), sample),
        fd=create_net_state(fd, fd_tx, keys.next(), sample),
        td=create_net_state(td, td_tx, keys.next(), sample2),
    )
    return (g, fd, td), states


def test_fused_matches_sequential_without_bn_dropout():
    """BN/dropout off => fused == sequential (gradient reduction order is
    the only float difference)."""
    txs = (adam(2e-4, b1=0.5), adam(2e-4, b1=0.5), adam(2e-4, b1=0.5))
    models, states_a = _tiny_states(KeySeq(0), txs)
    _, states_b = _tiny_states(KeySeq(0), txs)

    step_seq = make_dcgan_train_step(*models, *txs, fused_disc=False)
    step_fused = make_dcgan_train_step(*models, *txs, fused_disc=True)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(6, 16, 16, 4), jnp.float32)
    y = jnp.asarray(rng.rand(6, 16, 16, 4), jnp.float32)
    # partial mask exercises the masked-loss path
    mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    keys = KeySeq(7)
    for _ in range(3):
        k = keys.next()
        states_a, logs_a = step_seq(states_a, x, y, mask, k)
        states_b, logs_b = step_fused(states_b, x, y, mask, k)

    for name in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(
            float(logs_a[name]), float(logs_b[name]), rtol=1e-5, atol=1e-6)
    for sa, sb in ((states_a.g, states_b.g), (states_a.fd, states_b.fd),
                   (states_a.td, states_b.td)):
        for la, lb in zip(jax.tree_util.tree_leaves(sa.params),
                          jax.tree_util.tree_leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_disc_trains_real_models():
    """With the real BN-carrying models the fused step must run, update all
    three nets, and keep losses finite; the discriminator BN running stats
    must take exactly one (mixed) update per step instead of two."""
    models, txs, states, keys = build_dcgan(PARAMS)
    step = make_dcgan_train_step(*models, *txs, fused_disc=True)
    mesh = MeshContext.create()
    rng = np.random.RandomState(0)
    x, y, mask = mesh.pad_to_batch_multiple(
        rng.rand(8, 64, 64, 4).astype(np.float32),
        rng.rand(8, 64, 64, 4).astype(np.float32),
        batch_size=8,
    )
    x, y, mask = mesh.put_batch(x, y, mask)
    fd0 = np.asarray(jax.tree_util.tree_leaves(states.fd.params)[0])
    bs0 = np.asarray(jax.tree_util.tree_leaves(states.fd.batch_stats)[0])
    logs = None
    for _ in range(2):
        states, logs = step(states, x, y, mask, keys.next())
    for name in ("errFD", "errTD", "errG"):
        assert np.isfinite(float(logs[name]))
    assert not np.allclose(fd0, np.asarray(
        jax.tree_util.tree_leaves(states.fd.params)[0]))
    assert not np.allclose(bs0, np.asarray(
        jax.tree_util.tree_leaves(states.fd.batch_stats)[0]))


def test_fused_disc_megastep_matches_fused_single_steps():
    """megastep(fused_disc=True) == K fused single steps (same rng seq)."""
    txs = (adam(2e-4, b1=0.5), adam(2e-4, b1=0.5), adam(2e-4, b1=0.5))
    models, states_a = _tiny_states(KeySeq(0), txs)
    _, states_b = _tiny_states(KeySeq(0), txs)

    step_fused = make_dcgan_train_step(*models, *txs, fused_disc=True)
    mega = make_dcgan_megastep(*models, *txs, fused_disc=True)

    k = 3
    rng = np.random.RandomState(2)
    xs = jnp.asarray(rng.rand(k, 4, 16, 16, 4), jnp.float32)
    ys = jnp.asarray(rng.rand(k, 4, 16, 16, 4), jnp.float32)
    masks = jnp.ones((k, 4), jnp.float32)
    keys = KeySeq(11)
    rngs = jnp.stack([keys.next() for _ in range(k)])

    for i in range(k):
        states_a, _ = step_fused(states_a, xs[i], ys[i], masks[i], rngs[i])
    states_b, _ = mega(states_b, xs, ys, masks, rngs)

    for sa, sb in ((states_a.g, states_b.g), (states_a.fd, states_b.fd),
                   (states_a.td, states_b.td)):
        for la, lb in zip(jax.tree_util.tree_leaves(sa.params),
                          jax.tree_util.tree_leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-6)
