"""Vanilla-GAN FusedProp == default step EXACTLY (same semantics).

Unlike the dcgan variant, the vanilla reference updates G first
(gan_examples/vanilla_gan.py:163-188), so the G loss and the D-fake loss
already evaluate the SAME pre-update D on the same fake batch, and the
vanilla D is stateless — the fused body is the default body's math
reassociated. Under SGD the comparison holds at reassociation scale;
under the production Adam a sign-resolution budget applies (see
tests/test_fused_prop.py for the budget's derivation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.models import MLPDiscriminator, MLPGenerator
from extended_gan_tpu.train import create_net_state, make_vanilla_gan_step


def _setup(tx_factory, img=8, latent=16):
    keys = KeySeq(0)
    g = MLPGenerator(img_shape=(1, img, img), latent_dim=latent,
                     widths=(32, 64))
    d = MLPDiscriminator(img_shape=(1, img, img), widths=(32, 16))
    g_tx, d_tx = tx_factory(), tx_factory()
    gs = create_net_state(g, g_tx, keys.next(),
                          jnp.zeros((2, latent)), train=False)
    ds = create_net_state(d, d_tx, keys.next(),
                          jnp.zeros((2, 1, img, img)), train=False)
    return g, d, g_tx, d_tx, gs, ds


def _run(fused_prop, tx_factory, n_steps=3):
    g, d, g_tx, d_tx, gs, ds = _setup(tx_factory)
    step = make_vanilla_gan_step(g, d, g_tx, d_tx, latent_dim=16,
                                 fused_prop=fused_prop)
    rng = np.random.RandomState(1)
    keys = KeySeq(7)
    logs = None
    for _ in range(n_steps):
        real = jnp.asarray(rng.rand(4, 1, 8, 8) * 2 - 1, jnp.float32)
        gs, ds, logs = step(gs, ds, real, keys.next())
    return gs, ds, logs


def test_vanilla_fused_prop_matches_default_strict_sgd():
    gs_a, ds_a, logs_a = _run(False, lambda: optax.sgd(1e-3))
    gs_b, ds_b, logs_b = _run(True, lambda: optax.sgd(1e-3))
    for k in ("g_loss", "d_loss"):
        np.testing.assert_allclose(float(logs_a[k]), float(logs_b[k]),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves((gs_a, ds_a)),
                    jax.tree_util.tree_leaves((gs_b, ds_b))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_vanilla_fused_prop_adam_budget():
    n = 3
    gs_a, ds_a, _ = _run(False, lambda: optax.adam(2e-4), n_steps=n)
    gs_b, ds_b, _ = _run(True, lambda: optax.adam(2e-4), n_steps=n)
    budget = 2 * 2e-4 * n
    for a, b in zip(jax.tree_util.tree_leaves((gs_a.params, ds_a.params)),
                    jax.tree_util.tree_leaves((gs_b.params, ds_b.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=budget)
