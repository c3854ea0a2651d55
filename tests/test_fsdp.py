"""FSDP / ZeRO-3 (parallel/fsdp.py): numerics, memory, and collectives.

The reference is single-device (SURVEY.md §2.7); under our DP every chip
holds a full replica of params + Adam moments. FSDP shards both over the
``data`` axis and lets XLA's SPMD partitioner derive the ZeRO schedule.
These tests lock all three claims on the 8-virtual-device mesh:

- numerics: FSDP == replicated DP == single device, and FSDPxTP composes;
- memory: per-device shard bytes of params AND moments actually shrink,
  with exact 1/8 splits on the wide kernels;
- communication: the compiled HLO contains the param all-gathers (and the
  grad reduction) the annotation implies.
"""

import re

import jax
import numpy as np
import pytest

from extended_gan_tpu.parallel import (
    MeshContext,
    shard_net_state_fsdp,
    shard_net_state_tp,
)
from extended_gan_tpu.parallel.fsdp import _fsdp_spec
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step


def _build(mesh, *, fsdp=False, tp=False, ndf=8, min_size=1,
           tp_min_channels=32):
    params = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": ndf, "ndf": ndf,
              "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
              "save_epoch": 2}
    models, txs, states, _ = build_dcgan(params, seed=7)
    states = mesh.put_replicated(states)
    if tp:
        states = states.replace(
            fd=shard_net_state_tp(states.fd, mesh, tp_min_channels),
            td=shard_net_state_tp(states.td, mesh, tp_min_channels),
        )
    if fsdp:
        states = states.replace(
            g=shard_net_state_fsdp(states.g, mesh, min_size),
            fd=shard_net_state_fsdp(states.fd, mesh, min_size),
            td=shard_net_state_fsdp(states.td, mesh, min_size),
        )
    step = make_dcgan_train_step(*models, *txs)
    return states, step


def _one_step(mesh, **kw):
    states, step = _build(mesh, **kw)
    rng = np.random.RandomState(4)
    x = rng.rand(8, 64, 64, 4).astype(np.float32)
    y = rng.rand(8, 64, 64, 4).astype(np.float32)
    xb, yb, mb = mesh.put_batch(x, y, np.ones(8, np.float32))
    return step(states, xb, yb, mb, jax.random.PRNGKey(21))


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


def _bytes_on(device, tree) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        for s in leaf.addressable_shards:
            if s.device == device:
                total += s.data.nbytes
    return total


# ---------------------------------------------------------------- numerics

@pytest.mark.slow
def test_fsdp8_matches_single_device():
    """ZeRO over 8 devices == single device on the same global batch."""
    single = _one_step(MeshContext.create(data=1))
    fsdp = _one_step(MeshContext.create(data=8), fsdp=True)
    _assert_equal_outcome(single, fsdp)
    # the weights really are data-sharded after the step, not re-replicated
    k = fsdp[0].fd.params["Conv_3"]["kernel"]
    assert any("data" in ((e,) if isinstance(e, str) else tuple(e or ()))
               for e in k.sharding.spec), k.sharding.spec


@pytest.mark.slow
def test_fsdp4_tp2_composes():
    """(data=4, model=2): TP shards Cout over 'model', FSDP adds 'data' on
    a different axis of the same kernel — one placement, same numerics."""
    single = _one_step(MeshContext.create(data=1), ndf=16)
    mixed = _one_step(MeshContext.create(data=4, model=2),
                      fsdp=True, tp=True, ndf=16, min_size=1,
                      tp_min_channels=32)
    _assert_equal_outcome(single, mixed)
    k = mixed[0].fd.params["Conv_3"]["kernel"]  # (4, 4, 64, 128) at ndf=16
    spec = tuple(k.sharding.spec)
    assert "model" in spec and "data" in spec, spec


# ------------------------------------------------------------ shard bytes

def test_fsdp_params_and_moments_bytes_shrink():
    """ZeRO's memory claim in bytes: device 0 holds a small fraction of
    every net (params + Adam moments) under FSDP8, and the wide kernels
    split exactly 8 ways."""
    mesh = MeshContext.create(data=8)
    d0 = mesh.mesh.devices.flat[0]
    rep, _ = _build(mesh, ndf=64)
    fs, _ = _build(mesh, fsdp=True, ndf=64, min_size=4096)
    for net in ("g", "fd", "td"):
        for tree_name in ("params", "opt_state"):
            rb = _bytes_on(d0, getattr(getattr(rep, net), tree_name))
            fb = _bytes_on(d0, getattr(getattr(fs, net), tree_name))
            # wide discriminators (128..512 out-chans at ndf=64) are
            # dominated by >=4096-element kernels that shard 1/8; the
            # generator's channel widths scale with nc=4 (reference
            # parity) so most of its leaves stay replicated by design
            bound = 0.3 if net in ("fd", "td") else 1.0
            assert fb < bound * rb, (net, tree_name, fb, rb)
    k = fs.fd.params["Conv_3"]["kernel"]  # (4, 4, 256, 512)
    local = [s for s in k.addressable_shards if s.device == d0]
    assert len(local) == 1
    assert local[0].data.nbytes * 8 == k.nbytes
    for moment in jax.tree_util.tree_leaves(fs.fd.opt_state):
        if getattr(moment, "shape", None) == k.shape:
            lm = [s for s in moment.addressable_shards if s.device == d0]
            assert lm[0].data.nbytes * 8 == moment.nbytes


def test_fsdp_spec_rules():
    """Leaf-level policy: min_size gate, largest-divisible-axis pick,
    preservation of existing TP axes, and the EP leave-alone rule."""
    mesh = MeshContext.create(data=8)
    # big kernel: largest divisible axis (Cout=512) gets 'data'
    k = mesh.put_replicated(np.zeros((4, 4, 256, 512), np.float32))
    assert tuple(_fsdp_spec(k, 8, 4096)) == (None, None, None, "data")
    # small bias: below min_size -> None (stays replicated)
    b = mesh.put_replicated(np.zeros((512,), np.float32))
    assert _fsdp_spec(b, 8, 4096) is None
    # no divisible axis -> None
    odd = mesh.put_replicated(np.zeros((81, 81), np.float32))
    assert _fsdp_spec(odd, 8, 1) is None
    # TP-sharded Cout preserved; 'data' lands on Cin
    mesh2 = MeshContext.create(data=4, model=2)
    kt = jax.device_put(np.zeros((4, 4, 256, 512), np.float32),
                        mesh2.sharding(None, None, None, "model"))
    assert tuple(_fsdp_spec(kt, 4, 1)) == (None, None, "data", "model")
    # already data-sharded (EP expert stack) -> left alone
    ke = jax.device_put(np.zeros((8, 64, 64), np.float32),
                        mesh.sharding("data"))
    assert _fsdp_spec(ke, 8, 1) is None


# ------------------------------------------------------------ driver path

@pytest.mark.slow
def test_dcgan_driver_fsdp_path(tmp_path):
    """The FSDP path a user actually launches: python -m dcgan --fsdp."""
    from extended_gan_tpu.train.dcgan_driver import train

    states, history = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, out_dir=str(tmp_path), seed=11,
        params={"ndf": 64}, fsdp=True, fsdp_min_size=4096,
    )
    h = history.history
    assert np.isfinite(h["train_mse"][-1])
    assert np.isfinite(h["pred_mse"][-1])
    k = states.fd.params["Conv_3"]["kernel"]
    assert any("data" in ((e,) if isinstance(e, str) else tuple(e or ()))
               for e in k.sharding.spec), k.sharding.spec


@pytest.mark.slow
def test_gat_driver_fsdp_path(tmp_path):
    """conv-GAT CLI family: --fsdp through the real driver (synthetic
    KNMI data), on the SmaAt-UNet family whose channel widths divide the
    data axis. (The 43,936-param conv-GAT has no axis divisible by 8 —
    74/4/3-sized dims — so FSDP is a graceful no-op there by design;
    see test_fsdp_spec_rules for the no-divisible-axis rule.)"""
    from extended_gan_tpu.data.synthetic import make_kmni_dataset
    from extended_gan_tpu.train.gat_driver import train

    data = make_kmni_dataset(
        str(tmp_path / "kmni"), n_train_files=2, n_test_files=1,
        frames_per_file=20, n_vertices=6, hw=24)
    state, history = train(
        model_type="unet", optimizer="adam", mapping_type="linear",
        output_path=str(tmp_path / "out"),
        train_batch_size=8, test_batch_size=8, epochs=1,
        learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(16, 16), preprocessed_folder=data,
        dataset="kmni", max_batches=2, plot=False,
        fsdp=True, fsdp_min_size=4096,
    )
    assert np.isfinite(history["train_loss"][-1])
    leaves = jax.tree_util.tree_leaves(state.params)
    assert any(
        isinstance(l.sharding, jax.sharding.NamedSharding)
        and any("data" in ((e,) if isinstance(e, str) else tuple(e or ()))
                for e in l.sharding.spec)
        for l in leaves)


@pytest.mark.slow
def test_cyclegan_driver_fsdp_path(tmp_path):
    """cycle_gan: --fsdp through the real driver (synthetic data)."""
    from extended_gan_tpu.train.cyclegan_driver import train

    states, history = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, out_dir=str(tmp_path), seed=11, ndf=64,
        fsdp=True, fsdp_min_size=4096,
    )
    h = history.history
    assert np.isfinite(h["pred_mse"][-1])
    leaves = jax.tree_util.tree_leaves(states.d_x.params)
    assert any(
        isinstance(l.sharding, jax.sharding.NamedSharding)
        and any("data" in ((e,) if isinstance(e, str) else tuple(e or ()))
                for e in l.sharding.spec)
        for l in leaves)


@pytest.mark.slow
def test_dcgan_resume_reapplies_fsdp_sharding(tmp_path):
    """Resuming an FSDP run must re-shard the restored state: the resume
    path goes through the driver's place(), which owns the FSDP placement
    exactly as it owns TP's (same rule as
    test_cyclegan_resume_reapplies_tp_sharding)."""
    from extended_gan_tpu.train.dcgan_driver import train

    common = dict(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, seed=77,
        params={"ndf": 64, "save_epoch": 1},
        fsdp=True, fsdp_min_size=4096,
    )
    out = str(tmp_path / "fsdp")
    train(out_dir=out, **common)
    states, _ = train(**{**common, "epochs": 2}, out_dir=out, resume=True)

    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(states.fd.params)
        if hasattr(leaf, "sharding") and leaf.ndim == 4
        and any("data" in ((e,) if isinstance(e, str) else tuple(e or ()))
                for e in (leaf.sharding.spec or ()))
    ]
    assert sharded, "FD conv kernels lost their FSDP sharding on resume"


# ------------------------------------------------------------- collectives

@pytest.mark.slow
def test_fsdp_compiled_step_gathers_and_reduces():
    """The compiled train step must rebuild full params from shards
    (all-gather) and reduce gradients back (reduce-scatter, or all-reduce
    where XLA prefers it) — the ZeRO schedule, derived by GSPMD."""
    mesh = MeshContext.create(data=8)
    states, step = _build(mesh, fsdp=True, ndf=32, min_size=4096)
    rng = np.random.RandomState(0)
    x = rng.rand(8, 64, 64, 4).astype(np.float32)
    y = rng.rand(8, 64, 64, 4).astype(np.float32)
    xb, yb, mb = mesh.put_batch(x, y, np.ones(8, np.float32))
    txt = step.lower(states, xb, yb, mb,
                     jax.random.PRNGKey(0)).compile().as_text()

    def count(name):
        return len(re.findall(
            rf"= \S+ {name}\(|= \S+ {name}-start\(", txt))

    assert count("all-gather") > 0
    assert count("reduce-scatter") + count("all-reduce") > 0
