import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.models.unet_model import UnetModel
from extended_gan_tpu.train.gat_trainer import make_gat_train_step
from extended_gan_tpu.train.optim import adam
from extended_gan_tpu.train.state import create_net_state
import pytest


@pytest.mark.slow
def test_remat_step_matches_plain_step():
    """jax.checkpoint must change memory, never numerics."""
    model = UnetModel(image_width=16, image_height=16, n_vertices=2,
                      kernels_per_layer=1)
    tx = adam(1e-3)
    ks = KeySeq(0)
    rng = ks.next()
    sample = jnp.zeros((2, 16, 16, 4, 2))
    s1 = create_net_state(model, tx, rng, sample)
    s2 = create_net_state(model, tx, rng, sample)

    step_plain = make_gat_train_step(model, tx, remat=False)
    step_remat = make_gat_train_step(model, tx, remat=True)

    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(4, 16, 16, 4, 2).astype(np.float32))
    y = jnp.asarray(r.rand(4, 16, 16, 4, 2).astype(np.float32))
    mask = jnp.ones(4)
    k = jax.random.PRNGKey(5)
    s1, logs1 = step_plain(s1, x, y, mask, k)
    s2, logs2 = step_remat(s2, x, y, mask, k)
    np.testing.assert_allclose(float(logs1["loss"]), float(logs2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
