"""CycleGAN megastep == K sequential single steps (same rng sequence).

Mirrors tests/test_megastep.py's strict tier: under SGD any real bug
(wrong rng threading through the 4-key split, stale batch_stats, swapped
batch order across the dual G/D pairs) produces O(1) errors, while f32
reduction-order differences between the scanned and standalone programs
move SGD params by only ~lr * 1e-6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.models.dcgan import FrameDiscriminator, Generator
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.cyclegan_trainer import (
    CycleGANStates,
    make_cyclegan_megastep,
    make_cyclegan_train_step,
)
from extended_gan_tpu.train.state import create_net_state

K, B = 3, 8


def _data(seed=0):
    rng = np.random.RandomState(seed)
    xs = rng.rand(K, B, 64, 64, 4).astype(np.float32)
    ys = rng.rand(K, B, 64, 64, 4).astype(np.float32)
    masks = np.ones((K, B), np.float32)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(K)])
    return xs, ys, masks, rngs


def _build_sgd(seed=7):
    g_xy = Generator(nc=4)
    g_yx = Generator(nc=4)
    d_x = FrameDiscriminator(nc=4, ndf=8)
    d_y = FrameDiscriminator(nc=4, ndf=8)
    txs = tuple(optax.sgd(1e-3) for _ in range(4))
    keys = KeySeq(seed)
    s = jnp.zeros((2, 64, 64, 4), jnp.float32)
    states = CycleGANStates(
        g_xy=create_net_state(g_xy, txs[0], keys.next(), s),
        g_yx=create_net_state(g_yx, txs[1], keys.next(), s),
        d_x=create_net_state(d_x, txs[2], keys.next(), s),
        d_y=create_net_state(d_y, txs[3], keys.next(), s),
    )
    return (g_xy, g_yx, d_x, d_y), txs, states


@pytest.mark.slow
def test_cyclegan_megastep_sequencing_strict_sgd():
    xs, ys, masks, rngs = _data()
    mesh = MeshContext.create(data=4)
    models, txs, _ = _build_sgd()

    # fresh states per run: the fused steps DONATE their input state
    states_a = mesh.put_replicated(_build_sgd()[2])
    step = make_cyclegan_train_step(*models, *txs)
    nd_sum = None
    logs_a = None
    for i in range(K):
        xb, yb, mb = mesh.put_batch(xs[i], ys[i], masks[i])
        states_a, logs_a = step(states_a, xb, yb, mb, rngs[i])
        nd = np.asarray(logs_a["train_mse_nd"])
        nd_sum = nd if nd_sum is None else nd_sum + nd

    states_b = mesh.put_replicated(_build_sgd()[2])
    megastep = make_cyclegan_megastep(*models, *txs)
    xsd, ysd, msd = mesh.put_megabatch(xs, ys, masks)
    states_b, logs_b = megastep(states_b, xsd, ysd, msd, rngs)

    for a, b in zip(jax.tree_util.tree_leaves(states_a),
                    jax.tree_util.tree_leaves(states_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # scalars are the LAST step's; *_nd sums over the K steps
    np.testing.assert_allclose(
        float(logs_b["g_loss"]), float(logs_a["g_loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(logs_b["train_mse_nd"]), nd_sum, rtol=1e-5)
