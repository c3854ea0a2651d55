"""Sharding MECHANICS, not just numerics (round-2 VERDICT item 6).

The TP/SP/DP equivalence tests prove the math is unchanged; these tests
prove the memory and communication the shardings promise actually
materialize on the (virtual 8-device) mesh:

- per-device ``addressable_shards`` byte sizes shrink under TP (params AND
  Adam moments) and under SP (activation stripes);
- the compiled HLO of the fused train step contains exactly the collective
  families the layout implies — gradient all-reduces under DP, parameter
  all-gathers under TP, conv halo ``collective-permute`` exchanges under SP
  (the strongest multi-chip evidence available without multi-chip hardware).
"""

import re

import jax
import numpy as np
import pytest

from extended_gan_tpu.parallel import MeshContext, shard_net_state_tp
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

PARAMS = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 2}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _collective_counts(hlo_text: str) -> dict[str, int]:
    """Count collective ops in optimized-HLO text (sync or -start async)."""
    return {
        name: len(re.findall(
            rf"= \S+ {name}\(|= \S+ {name}-start\(", hlo_text))
        for name in _COLLECTIVES
    }


def _build(mesh, *, tp=False, ndf=8, tp_min_channels=32):
    p = dict(PARAMS, ndf=ndf, ngf=ndf)
    models, txs, states, _ = build_dcgan(p, seed=7)
    states = mesh.put_replicated(states)
    if tp:
        states = states.replace(
            fd=shard_net_state_tp(states.fd, mesh, tp_min_channels),
            td=shard_net_state_tp(states.td, mesh, tp_min_channels),
        )
    step = make_dcgan_train_step(*models, *txs)
    return states, step


def _compiled_counts(mesh, *, tp=False, spatial=False, ndf=8):
    states, step = _build(mesh, tp=tp, ndf=ndf)
    rng = np.random.RandomState(0)
    x = rng.rand(8, 64, 64, 4).astype(np.float32)
    y = rng.rand(8, 64, 64, 4).astype(np.float32)
    put = mesh.put_batch_spatial if spatial else mesh.put_batch
    xb, yb, mb = put(x, y, np.ones(8, np.float32))
    txt = step.lower(states, xb, yb, mb,
                     jax.random.PRNGKey(0)).compile().as_text()
    return _collective_counts(txt)


def _bytes_on(device, tree) -> int:
    """Total bytes the given device holds for every leaf of ``tree``."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        for s in leaf.addressable_shards:
            if s.device == device:
                total += s.data.nbytes
    return total


# --------------------------------------------------------------- HLO text

@pytest.mark.slow
def test_dp_compiled_step_allreduces_gradients():
    """Pure DP: the only collective family is the gradient all-reduce."""
    counts = _compiled_counts(MeshContext.create(data=8))
    assert counts["all-reduce"] > 0, counts
    assert counts["all-gather"] == 0, counts
    assert counts["collective-permute"] == 0, counts


@pytest.mark.slow
def test_tp_compiled_step_gathers_model_shards():
    """TP over 'model': XLA must insert all-gathers to rebuild activations
    from output-channel-sharded conv kernels (plus psums for the grads)."""
    counts = _compiled_counts(
        MeshContext.create(data=1, model=2), tp=True, ndf=32)
    assert counts["all-gather"] > 0, counts
    assert counts["all-reduce"] > 0, counts


@pytest.mark.slow
def test_sp_compiled_step_exchanges_conv_halos():
    """SP stripes the frame-height axis: every spatial conv needs halo rows
    from neighbouring shards, which GSPMD implements as collective-permute
    (observed: >150 of them across the step's ~18 conv fwd+bwd passes)."""
    counts = _compiled_counts(
        MeshContext.create(data=2, model=4), spatial=True)
    assert counts["collective-permute"] > 0, counts
    assert counts["all-reduce"] > 0, counts  # grads still psum over 'data'


@pytest.mark.slow
def test_hybrid_mesh_compiled_step_collectives():
    """3-axis hybrid (dcn, data, model): TP all-gathers AND grad
    all-reduces both present in one compiled program."""
    mesh = MeshContext.create_hybrid(dcn=2, data=2, model=2)
    counts = _compiled_counts(mesh, tp=True, ndf=32)
    assert counts["all-gather"] > 0, counts
    assert counts["all-reduce"] > 0, counts


# ------------------------------------------------------------ shard bytes

def test_tp_params_and_adam_moments_bytes_shrink():
    """TP's memory claim, in bytes: device 0 holds strictly less of the
    discriminator (params + Adam moments) under TP2 than replicated, and
    every sharded wide kernel's local shard is exactly 1/n_model of it."""
    mesh = MeshContext.create(data=1, model=2)
    d0 = mesh.mesh.devices.flat[0]

    rep_states, _ = _build(mesh, tp=False, ndf=64)
    tp_states, _ = _build(mesh, tp=True, ndf=64, tp_min_channels=64)

    for net in ("fd", "td"):
        rep_net = getattr(rep_states, net)
        tp_net = getattr(tp_states, net)
        for tree_name in ("params", "opt_state"):
            rep_b = _bytes_on(d0, getattr(rep_net, tree_name))
            tp_b = _bytes_on(d0, getattr(tp_net, tree_name))
            # ndf=64 discriminators: the wide kernels (128..512 out-chans)
            # dominate; TP2 should cut device-0 bytes by >25%.
            assert tp_b < 0.75 * rep_b, (net, tree_name, tp_b, rep_b)

    # spot-check exact halving of one wide kernel and its Adam moments
    k = tp_states.fd.params["Conv_3"]["kernel"]  # (4, 4, 256, 512)
    local = [s for s in k.addressable_shards if s.device == d0]
    assert len(local) == 1
    assert local[0].data.nbytes * mesh.n_model == k.nbytes
    for moment in jax.tree_util.tree_leaves(tp_states.fd.opt_state):
        if getattr(moment, "shape", None) == k.shape:
            lm = [s for s in moment.addressable_shards if s.device == d0]
            assert lm[0].data.nbytes * mesh.n_model == moment.nbytes


def test_sp_activation_stripe_bytes():
    """SP: each device holds exactly a (B/data, H/model) stripe of the
    batch — 1/8 of the bytes on the 2x4 mesh."""
    mesh = MeshContext.create(data=2, model=4)
    x = np.zeros((8, 64, 64, 4), np.float32)
    xd, _ = mesh.put_batch_spatial(x, np.ones(8, np.float32))
    for d in mesh.mesh.devices.flat:
        assert _bytes_on(d, xd) * 8 == x.nbytes


def test_dp_batch_shard_bytes():
    """DP: each device holds 1/8 of the batch bytes, all of the params."""
    mesh = MeshContext.create(data=8)
    states, _ = _build(mesh)
    x = np.zeros((8, 64, 64, 4), np.float32)
    xd = mesh.put_batch(x)
    d0 = mesh.mesh.devices.flat[0]
    assert _bytes_on(d0, xd) * 8 == x.nbytes
    # params replicated: every device holds the full copy
    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(states.g.params))
    assert _bytes_on(d0, states.g.params) == total
