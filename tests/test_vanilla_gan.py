import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.models import MLPGenerator, MLPDiscriminator
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train import (
    adam,
    bce,
    create_net_state,
    make_vanilla_gan_step,
    param_count,
)


def _setup(img=8, latent=16):
    keys = KeySeq(0)
    g = MLPGenerator(img_shape=(1, img, img), latent_dim=latent,
                     widths=(32, 64))
    d = MLPDiscriminator(img_shape=(1, img, img), widths=(32, 16))
    g_tx, d_tx = adam(2e-4, b1=0.5), adam(2e-4, b1=0.5)
    gs = create_net_state(g, g_tx, keys.next(),
                          jnp.zeros((2, latent)), train=False)
    ds = create_net_state(d, d_tx, keys.next(),
                          jnp.zeros((2, 1, img, img)), train=False)
    return g, d, g_tx, d_tx, gs, ds, keys


def test_generator_output_range_and_shape():
    g, d, g_tx, d_tx, gs, ds, keys = _setup()
    z = jax.random.normal(keys.next(), (4, 16))
    out = g.apply({"params": gs.params, "batch_stats": gs.batch_stats},
                  z, train=False)
    assert out.shape == (4, 1, 8, 8)
    assert (jnp.abs(out) <= 1.0).all()


def test_bce_matches_manual():
    p = jnp.array([0.9, 0.1])
    # -(log .9 + log .9)/2
    expected = -(np.log(0.9) + np.log(0.9)) / 2
    assert abs(float(bce(p, jnp.array([1.0, 0.0]))) - expected) < 1e-6


def test_bce_clamps_saturated():
    p = jnp.array([0.0])
    assert float(bce(p, 1.0)) == 100.0  # torch clamps log at -100


def test_fused_step_updates_both_nets_and_reduces_loss():
    g, d, g_tx, d_tx, gs, ds, keys = _setup()
    step = make_vanilla_gan_step(g, d, g_tx, d_tx, latent_dim=16)
    mesh = MeshContext.create()
    real = mesh.put_batch(
        np.random.RandomState(0).randn(16, 1, 8, 8).astype(np.float32))
    g0 = jax.tree_util.tree_leaves(gs.params)[0].copy()
    losses = None
    for _ in range(5):
        gs, ds, losses = step(gs, ds, real, keys.next())
    g1 = jax.tree_util.tree_leaves(gs.params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    assert np.isfinite(float(losses["g_loss"]))
    assert np.isfinite(float(losses["d_loss"]))


def test_step_is_deterministic_given_key():
    g, d, g_tx, d_tx, gs, ds, keys = _setup()
    step = make_vanilla_gan_step(g, d, g_tx, d_tx, latent_dim=16)
    real = jnp.asarray(
        np.random.RandomState(0).randn(8, 1, 8, 8).astype(np.float32))
    k = jax.random.PRNGKey(7)
    _, _, l1 = step(gs, ds, real, k)
    # re-create fresh states (step donates its inputs)
    g2, d2, g_tx2, d_tx2, gs2, ds2, _ = _setup()
    _, _, l2 = step(gs2, ds2, real, k)
    assert float(l1["g_loss"]) == float(l2["g_loss"])


def test_param_count_positive():
    g, d, g_tx, d_tx, gs, ds, keys = _setup()
    assert param_count(gs) > 0


def test_cli_smoke(tmp_path):
    """Run the actual entrypoint for a few batches on synthetic data."""
    import gan_examples.vanilla_gan as vg

    vg.main([
        "--n_epochs", "1", "--batch_size", "32", "--img_size", "8",
        "--latent_dim", "8", "--max_batches", "3",
        "--data_root", "",  # force synthetic
        "--out_dir", str(tmp_path),
        "--sample_interval", "2",
    ])
    import os

    assert os.path.exists(tmp_path / "0.png")


def test_mlp_layers_use_torch_default_init():
    """MLP G/D kernels/biases follow torch nn.Linear defaults —
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — not flax's lecun_normal/zeros
    (round-2 review: parity gap in training dynamics)."""
    import jax
    import numpy as np

    from extended_gan_tpu.models.vanilla_gan import MLPDiscriminator

    d = MLPDiscriminator(img_shape=(1, 8, 8))
    variables = d.init(jax.random.PRNGKey(0), np.zeros((2, 1, 8, 8)))
    k0 = np.asarray(variables["params"]["Dense_0"]["kernel"])
    b0 = np.asarray(variables["params"]["Dense_0"]["bias"])
    bound = 1.0 / np.sqrt(k0.shape[0])
    assert abs(k0).max() <= bound + 1e-6
    assert abs(k0).max() > 0.8 * bound     # actually uniform, not normal
    assert abs(b0).max() <= bound + 1e-6
    assert abs(b0).max() > 0.0             # not flax's zeros
