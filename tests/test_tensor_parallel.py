"""Tensor-parallel correctness: sharding wide discriminator conv kernels
(and their Adam moments) over the mesh ``model`` axis must not change the
numerics — XLA's GSPMD inserts the collectives; the math is identical.

Covers VERDICT round-1 item 6: TP at realistic width (ndf=64, model=2) ==
fully replicated, a DPxTP mixed-mesh variant of the DP-equivalence test,
and the user-launchable driver path (`python -m dcgan --model-axis 2`).
"""

import jax
import numpy as np
import pytest

from extended_gan_tpu.parallel import MeshContext, shard_net_state_tp
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step


def _one_step(data, model, x, y, key, *, ndf, tp_min_channels=64):
    params = {"bsize": len(x), "imsize": 64, "nc": 4, "ngf": ndf,
              "ndf": ndf, "nepochs": 1, "lr": 2e-4, "beta1": 0.5,
              "nz": 100, "save_epoch": 2}
    models, txs, states, _ = build_dcgan(params, seed=7)
    mesh = MeshContext.create(data=data, model=model)
    states = mesh.put_replicated(states)
    if mesh.n_model > 1:
        states = states.replace(
            fd=shard_net_state_tp(states.fd, mesh, tp_min_channels),
            td=shard_net_state_tp(states.td, mesh, tp_min_channels),
        )
    step = make_dcgan_train_step(*models, *txs)
    xb, yb, mb = mesh.put_batch(x, y, np.ones(len(x), np.float32))
    states, logs = step(states, xb, yb, mb, key)
    return states, logs


def _assert_equal_outcome(res_a, res_b, atol_params=5e-4):
    states_a, logs_a = res_a
    states_b, logs_b = res_b
    for k in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(
            float(logs_a[k]), float(logs_b[k]), rtol=1e-4, atol=1e-5)
    for net in ("g", "fd", "td"):
        la = jax.tree_util.tree_leaves(getattr(states_a, net).params)
        lb = jax.tree_util.tree_leaves(getattr(states_b, net).params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=atol_params)


@pytest.mark.slow
def test_tp2_matches_replicated_realistic_width():
    """ndf=64 (the reference's production width): model=2 TP == model=1."""
    rng = np.random.RandomState(4)
    x = rng.rand(4, 64, 64, 4).astype(np.float32)
    y = rng.rand(4, 64, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(21)
    rep = _one_step(1, 1, x, y, key, ndf=64)
    tp = _one_step(1, 2, x, y, key, ndf=64)
    _assert_equal_outcome(rep, tp)
    # the TP run's wide FD kernels really are sharded over 'model'
    fd_params = tp[0].fd.params
    k4 = fd_params["Conv_3"]["kernel"]  # (4, 4, 256, 512)
    assert k4.shape[-1] == 512
    spec = k4.sharding.spec
    assert tuple(spec) == (None, None, None, "model"), spec


@pytest.mark.slow
def test_dp4_tp2_matches_single_device():
    """Mixed 4x2 (data x model) mesh == single device on one global batch."""
    rng = np.random.RandomState(5)
    x = rng.rand(8, 64, 64, 4).astype(np.float32)
    y = rng.rand(8, 64, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(22)
    single = _one_step(1, 1, x, y, key, ndf=16, tp_min_channels=32)
    mixed = _one_step(4, 2, x, y, key, ndf=16, tp_min_channels=32)
    _assert_equal_outcome(single, mixed)


@pytest.mark.slow
def test_dcgan_driver_model_axis_path(tmp_path):
    """The TP path a user actually launches: python -m dcgan --model-axis 2."""
    from extended_gan_tpu.train.dcgan_driver import train

    states, history = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, out_dir=str(tmp_path), seed=11,
        params={"ndf": 64}, model_axis=2, tp_min_channels=64,
    )
    h = history.history
    assert np.isfinite(h["train_mse"][-1])
    assert np.isfinite(h["pred_mse"][-1])


@pytest.mark.slow
def test_cyclegan_tp2_matches_replicated():
    """CycleGAN fused step: (data=4, model=2) with both discriminators'
    wide kernels TP-sharded == replicated single-device — the layout the
    cycle_gan CLI's --model-axis flag builds."""
    from extended_gan_tpu.train.cyclegan_driver import build_cyclegan

    rng = np.random.RandomState(9)
    x = rng.rand(8, 64, 64, 4).astype(np.float32)
    y = rng.rand(8, 64, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(21)

    def one_step(mesh, tp):
        models, txs, states, step, eval_step, keys = build_cyclegan(
            nc=4, ndf=8, imsize=64, seed=7,
        )
        states = mesh.put_replicated(states)
        if tp:
            states = states.replace(
                d_x=shard_net_state_tp(states.d_x, mesh, min_channels=16),
                d_y=shard_net_state_tp(states.d_y, mesh, min_channels=16),
            )
        xb, yb, mb = mesh.put_batch(x, y, np.ones(len(x), np.float32))
        states, logs = step(states, xb, yb, mb, key)
        return states, logs

    states1, logs1 = one_step(MeshContext.create(data=1), tp=False)
    statesT, logsT = one_step(
        MeshContext.create(data=4, model=2), tp=True)

    for k in ("g_loss", "cycle_loss", "d_x_loss", "d_y_loss"):
        np.testing.assert_allclose(
            float(logs1[k]), float(logsT[k]), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(states1.g_xy.params),
                    jax.tree_util.tree_leaves(statesT.g_xy.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(states1.d_x.params),
                    jax.tree_util.tree_leaves(statesT.d_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
