"""Data-parallel correctness: the same global batch must produce the same
update whether it runs on 1 device or sharded over 8 — the guarantee the
mesh/DP layer owes its users (the reference has no equivalent to test,
SURVEY 2.7)."""

import pytest
import jax
import numpy as np

from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

PARAMS = {"bsize": 16, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 2}


def _one_step(mesh, x, y, key):
    models, txs, states, _ = build_dcgan(PARAMS, seed=7)
    states = mesh.put_replicated(states)
    step = make_dcgan_train_step(*models, *txs)
    xb, yb, mb = mesh.put_batch(x, y, np.ones(len(x), np.float32))
    states, logs = step(states, xb, yb, mb, key)
    return states, logs


def test_dp8_matches_single_device():
    rng = np.random.RandomState(0)
    x = rng.rand(16, 64, 64, 4).astype(np.float32)
    y = rng.rand(16, 64, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(11)

    states1, logs1 = _one_step(MeshContext.create(data=1), x, y, key)
    states8, logs8 = _one_step(MeshContext.create(data=8), x, y, key)

    for k in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(
            float(logs1[k]), float(logs8[k]), rtol=1e-4, atol=1e-5)
    # Updated generator params agree to the Adam step scale: the first Adam
    # update is ~lr * sign(g), so f32 reduction-order noise in the sharded
    # psum can move an element by O(lr)=2e-4 — anything beyond that would
    # indicate a real DP bug.
    l1 = jax.tree_util.tree_leaves(states1.g.params)
    l8 = jax.tree_util.tree_leaves(states8.g.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4)
    # BatchNorm running stats are GLOBAL-batch stats in both layouts
    s1 = jax.tree_util.tree_leaves(states1.fd.batch_stats)
    s8 = jax.tree_util.tree_leaves(states8.fd.batch_stats)
    for a, b in zip(s1, s8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_gat_dp8_matches_single_device():
    """conv-GAT fused train step: DP1 == DP8 (losses, params)."""
    import jax.numpy as jnp

    from extended_gan_tpu.models.gat.gat3d import Model
    from extended_gan_tpu.train.gat_trainer import make_gat_train_step
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    rng = np.random.RandomState(1)
    x = rng.rand(16, 12, 12, 4, 6).astype(np.float32)
    y = rng.rand(16, 12, 12, 4, 6).astype(np.float32)
    key = jax.random.PRNGKey(3)

    def one_step(mesh):
        model = Model(image_width=12, image_height=12, n_vertices=6,
                      attention_type="temporal", mapping_type="conv")
        tx = adam(1e-3, weight_decay=0.01)
        state = create_net_state(
            model, tx, jax.random.PRNGKey(5),
            jnp.zeros((2, 12, 12, 4, 6)),
        )
        state = mesh.put_replicated(state)
        step = make_gat_train_step(model, tx)
        xb, yb, mb = mesh.put_batch(x, y, np.ones(len(x), np.float32))
        state, logs = step(state, xb, yb, mb, key)
        return state, logs

    state1, logs1 = one_step(MeshContext.create(data=1))
    state8, logs8 = one_step(MeshContext.create(data=8))

    np.testing.assert_allclose(
        float(logs1["loss"]), float(logs8["loss"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(logs1["running_nd"]), np.asarray(logs8["running_nd"]),
        rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.slow
def test_cyclegan_dp8_matches_single_device():
    """CycleGAN fused train step: DP1 == DP8 (losses, params, BN stats)."""
    from extended_gan_tpu.train.cyclegan_driver import build_cyclegan

    rng = np.random.RandomState(2)
    x = rng.rand(16, 64, 64, 4).astype(np.float32)
    y = rng.rand(16, 64, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(13)

    def one_step(mesh):
        models, txs, states, step, eval_step, keys = build_cyclegan(
            nc=4, ndf=8, imsize=64, seed=7,
        )
        states = mesh.put_replicated(states)
        xb, yb, mb = mesh.put_batch(x, y, np.ones(len(x), np.float32))
        states, logs = step(states, xb, yb, mb, key)
        return states, logs

    states1, logs1 = one_step(MeshContext.create(data=1))
    states8, logs8 = one_step(MeshContext.create(data=8))

    for k in ("g_loss", "cycle_loss", "d_x_loss", "d_y_loss"):
        np.testing.assert_allclose(
            float(logs1[k]), float(logs8[k]), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(states1.g_xy.params),
                    jax.tree_util.tree_leaves(states8.g_xy.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(states1.d_x.batch_stats),
                    jax.tree_util.tree_leaves(states8.d_x.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_hybrid_dcn_mesh_matches_single_device():
    """Fused DCGAN step under a 3-axis (dcn=2, data=2, model=2) hybrid mesh
    == single device: the cross-slice gradient psum and the intra-slice
    TP all-gathers change nothing but the layout."""
    from extended_gan_tpu.parallel import shard_net_state_tp

    rng = np.random.RandomState(2)
    x = rng.rand(16, 64, 64, 4).astype(np.float32)
    y = rng.rand(16, 64, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(5)

    states1, logs1 = _one_step(MeshContext.create(data=1), x, y, key)

    mesh = MeshContext.create_hybrid(dcn=2, data=2, model=2)
    models, txs, states, _ = build_dcgan(PARAMS, seed=7)
    states = mesh.put_replicated(states)
    states = states.replace(
        fd=shard_net_state_tp(states.fd, mesh, min_channels=32),
        td=shard_net_state_tp(states.td, mesh, min_channels=32),
    )
    step = make_dcgan_train_step(*models, *txs)
    xb, yb, mb = mesh.put_batch(x, y, np.ones(len(x), np.float32))
    statesH, logsH = step(states, xb, yb, mb, key)

    for k in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(
            float(logs1[k]), float(logsH[k]), rtol=1e-4, atol=1e-5)
    l1 = jax.tree_util.tree_leaves(states1.g.params)
    lH = jax.tree_util.tree_leaves(statesH.g.params)
    for a, b in zip(l1, lH):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
