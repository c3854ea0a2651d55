"""Spatial partitioning (SP) correctness: sharding the frame-height axis
over the mesh's model axis must not change the update — XLA's SPMD
partitioner owes us the conv halo exchanges. Mirrors the DP1==DP8 tests."""

import jax
import numpy as np
import pytest

from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

PARAMS = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 2}


def _one_step(mesh, x, y, key, spatial):
    models, txs, states, _ = build_dcgan(PARAMS, seed=7)
    states = mesh.put_replicated(states)
    step = make_dcgan_train_step(*models, *txs)
    put = mesh.put_batch_spatial if spatial else mesh.put_batch
    xb, yb, mb = put(x, y, np.ones(len(x), np.float32))
    states, logs = step(states, xb, yb, mb, key)
    return states, logs


def test_sp_matches_single_device():
    """DP2 x SP4 == single device (losses, params, BN stats)."""
    rng = np.random.RandomState(3)
    x = rng.rand(8, 64, 64, 4).astype(np.float32)
    y = rng.rand(8, 64, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(5)

    states1, logs1 = _one_step(
        MeshContext.create(data=1), x, y, key, spatial=False)
    mesh_sp = MeshContext.create(data=2, model=4)
    states_sp, logs_sp = _one_step(mesh_sp, x, y, key, spatial=True)

    for k in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(
            float(logs1[k]), float(logs_sp[k]), rtol=1e-4, atol=1e-5)
    # first-Adam-step scale bound, as in the DP test
    for a, b in zip(jax.tree_util.tree_leaves(states1.g.params),
                    jax.tree_util.tree_leaves(states_sp.g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(states1.fd.batch_stats),
                    jax.tree_util.tree_leaves(states_sp.fd.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_spatial_put_shards_height_axis():
    mesh = MeshContext.create(data=2, model=4)
    x = np.zeros((4, 64, 64, 4), np.float32)
    m = np.ones((4,), np.float32)
    xd, md = mesh.put_batch_spatial(x, m)
    assert xd.sharding.spec == jax.sharding.PartitionSpec("data", "model")
    assert md.sharding.spec == jax.sharding.PartitionSpec("data")
    # per-device shard is a (B/2, H/4) stripe
    db = xd.addressable_shards[0].data.shape
    assert db == (2, 16, 64, 4)


def test_spatial_put_rejects_indivisible_height():
    mesh = MeshContext.create(data=2, model=4)
    x = np.zeros((4, 30, 30, 4), np.float32)  # 30 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        mesh.put_batch_spatial(x)


def test_spatial_megabatch_put_shards_height_axis():
    """put_megabatch(spatial=True): (K, B, H, ...) -> steps replicated,
    batch over DP, frame height over the model axis; (K, B) masks over
    DP only."""
    mesh = MeshContext.create(data=2, model=4)
    xs = np.zeros((3, 4, 64, 64, 4), np.float32)
    ms = np.ones((3, 4), np.float32)
    xd, md = mesh.put_megabatch(xs, ms, spatial=True)
    P = jax.sharding.PartitionSpec
    assert xd.sharding.spec == P(None, "data", "model")
    assert md.sharding.spec == P(None, "data")
    assert xd.addressable_shards[0].data.shape == (3, 2, 16, 64, 4)
    with pytest.raises(ValueError, match="not divisible"):
        mesh.put_megabatch(np.zeros((3, 4, 30, 30, 4), np.float32),
                           spatial=True)


@pytest.mark.slow
def test_sp_megastep_matches_single_device():
    """megastep(K) under DP2 x SP4 == megastep(K) on a single device —
    the two modes compose (the staged megabatch stripes the frame axis,
    GSPMD inserts the halo exchanges inside the scanned program)."""
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_megastep

    K = 2
    rng = np.random.RandomState(11)
    xs = rng.rand(K, 8, 64, 64, 4).astype(np.float32)
    ys = rng.rand(K, 8, 64, 64, 4).astype(np.float32)
    masks = np.ones((K, 8), np.float32)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(K)])

    def run(mesh, spatial):
        models, txs, states, _ = build_dcgan(PARAMS, seed=7)
        states = mesh.put_replicated(states)
        mega = make_dcgan_megastep(*models, *txs)
        xsd, ysd, msd = mesh.put_megabatch(xs, ys, masks, spatial=spatial)
        return mega(states, xsd, ysd, msd, rngs)

    states1, logs1 = run(MeshContext.create(data=1), spatial=False)
    states_sp, logs_sp = run(MeshContext.create(data=2, model=4),
                             spatial=True)

    for k in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(
            float(logs1[k]), float(logs_sp[k]), rtol=1e-4, atol=1e-5)
    # K Adam steps: a near-zero-gradient coordinate resolves halo-exchange
    # reassociation noise to a sign and moves ~lr per step -> K*2*lr budget
    for a, b in zip(jax.tree_util.tree_leaves(states1.g.params),
                    jax.tree_util.tree_leaves(states_sp.g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=K * 2 * 2e-4)


@pytest.mark.slow
def test_dcgan_driver_spatial_end_to_end(tmp_path):
    """The --spatial path trains a full (tiny) epoch with finite losses."""
    from extended_gan_tpu.train.dcgan_driver import train

    states, hist = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, seed=13, out_dir=str(tmp_path / "run"),
        data_axis=2, model_axis=4, spatial=True,
        params={"imsize": 64, "ngf": 8, "ndf": 8, "save_epoch": 0},
    )
    assert np.isfinite(hist.history["train_mse"][-1])
    assert np.isfinite(hist.history["pred_mse"][-1])


@pytest.mark.slow
def test_cyclegan_driver_spatial_end_to_end(tmp_path):
    from extended_gan_tpu.train.cyclegan_driver import train

    states, hist = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        imsize=64, ndf=8, synthetic=True, seed=21,
        out_dir=str(tmp_path / "run"),
        data_axis=2, model_axis=4, spatial=True,
    )
    assert np.isfinite(hist.history["pred_mse"][-1])
    assert np.isfinite(hist.history["cycle_l1"][-1])


@pytest.mark.slow
def test_gat_sp_matches_single_device():
    """conv-GAT fused step: DP2 x SP4 == single device."""
    import jax.numpy as jnp

    from extended_gan_tpu.models.gat.gat3d import Model
    from extended_gan_tpu.train.gat_trainer import (
        _prep_gat_batch,
        make_gat_train_step,
    )
    from extended_gan_tpu.train.optim import make_optimizer
    from extended_gan_tpu.train.state import create_net_state

    def run(mesh, spatial):
        model = Model(image_width=16, image_height=16, n_vertices=6,
                      attention_type="temporal", mapping_type="conv")
        tx = make_optimizer("adam", 1e-3, weight_decay=0.01)
        state = create_net_state(
            model, tx, jax.random.PRNGKey(2),
            jnp.zeros((2, 16, 16, 4, 6), jnp.float32))
        state = mesh.put_replicated(state)
        step = make_gat_train_step(model, tx)
        rng = np.random.RandomState(4)
        x = rng.rand(8, 16, 16, 4, 6).astype(np.float32)
        y = rng.rand(8, 16, 16, 4, 6).astype(np.float32)
        xd, yd, mask = _prep_gat_batch(mesh, x, y, spatial=spatial)
        state, logs = step(state, xd, yd, mask, jax.random.PRNGKey(9))
        return state, logs

    s1, l1 = run(MeshContext.create(data=1), spatial=False)
    s_sp, l_sp = run(MeshContext.create(data=2, model=4), spatial=True)
    np.testing.assert_allclose(
        float(l1["running_nd"][0]), float(l_sp["running_nd"][0]),
        rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
