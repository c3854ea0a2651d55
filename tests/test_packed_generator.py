"""Packed (space-to-depth) Generator == unpacked Generator, exactly.

The packed mode (models/dcgan.py ``Generator(packed=True)``, kernels in
ops/space_to_depth.py) recomputes the reference generator
(/root/reference/dcgan/model.py:55-76) in 2x2 space-to-depth layout for
MXU utilization. It must be a pure layout change: identical param tree
and init values, identical forward function (train and eval), identical
BN statistic updates, identical dropout draws, and gradients that match
through the packed-weight transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.models.dcgan import Generator
from extended_gan_tpu.ops.space_to_depth import (
    pack2,
    pack_conv_weights,
    packed_conv_same,
    unpack2,
)

B, H, W, NC = 4, 64, 64, 4


def _init(packed: bool, dropout: float = 0.01):
    g = Generator(nc=NC, dropout=dropout, packed=packed)
    x = jnp.zeros((B, H, W, NC), jnp.float32)
    variables = g.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        x,
        train=True,
    )
    return g, variables


def test_pack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 6, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpack2(pack2(x))), np.asarray(x))


def test_packed_conv_matches_direct_conv_exactly():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 16, 5), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 5, 7).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 2), (1, 2)),  # flax SAME for k=4: lo=1, hi=2
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = unpack2(packed_conv_same(pack2(x), pack_conv_weights(w)))
    # extra packed taps multiply structural zeros -> exact equality
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0,
                               atol=1e-5)


@pytest.mark.slow
def test_param_trees_identical():
    _, v_u = _init(packed=False)
    _, v_p = _init(packed=True)
    flat_u = jax.tree_util.tree_flatten_with_path(v_u)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(v_p)[0]
    assert [p for p, _ in flat_u] == [p for p, _ in flat_p]
    for (path, a), (_, b) in zip(flat_u, flat_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.slow
def test_forward_parity(train):
    g_u, v = _init(packed=False)
    g_p, _ = _init(packed=True)
    x = jnp.asarray(np.random.RandomState(2).rand(B, H, W, NC), jnp.float32)
    kw = dict(train=train)
    rngs = {"dropout": jax.random.PRNGKey(11)} if train else {}
    if train:
        y_u, mut_u = g_u.apply(v, x, rngs=rngs, mutable=["batch_stats"], **kw)
        y_p, mut_p = g_p.apply(v, x, rngs=rngs, mutable=["batch_stats"], **kw)
        # BN running stats updated identically up to f32 summation order
        # (packed reduces (B,H2,W2,phase); unpacked reduces (B,H,W))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            mut_u, mut_p)
    else:
        y_u = g_u.apply(v, x, **kw)
        y_p = g_p.apply(v, x, **kw)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u),
                               rtol=1e-5, atol=1e-6)


def test_dropout_draw_identical():
    """Same derived rng stream: a high dropout rate makes divergence loud."""
    g_u, v = _init(packed=False, dropout=0.5)
    g_p, _ = _init(packed=True, dropout=0.5)
    x = jnp.asarray(np.random.RandomState(3).rand(B, H, W, NC), jnp.float32)
    rngs = {"dropout": jax.random.PRNGKey(21)}
    y_u = g_u.apply(v, x, rngs=rngs, mutable=["batch_stats"], train=True)[0]
    y_p = g_p.apply(v, x, rngs=rngs, mutable=["batch_stats"], train=True)[0]
    # a wrong mask would diverge at ~50% of elements by O(1); float
    # summation order gives ~1e-6 — assert well below the former
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_step_parity():
    """Full adversarial step (G + both Ds + 3 Adams) with packed vs
    unpacked G: same init (identical param trees), same batches, same rng
    sequence. Losses/BN stats track at float-reassociation scale; params
    get an absolute budget of 2*lr*steps on top — an Adam coordinate with
    a near-zero gradient resolves reassociation noise to a sign, moving
    that coordinate by up to lr per step (the dedup_g test can assert
    bitwise because its two programs are the same math; these two are
    reassociated math)."""
    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.train.dcgan_driver import build_dcgan
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

    params = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
              "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
              "save_epoch": 0}
    models_u, txs, states_u, _ = build_dcgan(params)
    models_p, _, states_p, _ = build_dcgan(params, packed_g=True)
    step_u = make_dcgan_train_step(*models_u, *txs)
    step_p = make_dcgan_train_step(*models_p, *txs)

    rng = np.random.RandomState(6)
    x = rng.rand(8, 64, 64, 4).astype(np.float32)
    y = rng.rand(8, 64, 64, 4).astype(np.float32)
    mask = np.ones(8, np.float32)
    keys = KeySeq(5)
    n_steps = 2
    for _ in range(n_steps):
        k = keys.next()
        states_u, logs_u = step_u(states_u, x, y, mask, k)
        states_p, logs_p = step_p(states_p, x, y, mask, k)
        for name in ("errFD", "errTD", "errG"):
            np.testing.assert_allclose(float(logs_u[name]),
                                       float(logs_p[name]),
                                       rtol=1e-4, atol=1e-6)
    budget = 2 * 2e-4 * n_steps
    for net_u, net_p in ((states_u.g, states_p.g),
                         (states_u.fd, states_p.fd),
                         (states_u.td, states_p.td)):
        for lu, lp in zip(jax.tree_util.tree_leaves(net_u.params),
                          jax.tree_util.tree_leaves(net_p.params)):
            np.testing.assert_allclose(np.asarray(lu), np.asarray(lp),
                                       rtol=1e-3, atol=budget)
        # BN stats are not Adam-updated but are functions of the drifted
        # params, so they get the same absolute budget
        for lu, lp in zip(jax.tree_util.tree_leaves(net_u.batch_stats),
                          jax.tree_util.tree_leaves(net_p.batch_stats)):
            np.testing.assert_allclose(np.asarray(lu), np.asarray(lp),
                                       rtol=1e-3, atol=budget)


@pytest.mark.slow
def test_checkpoint_interchange_with_unpacked(tmp_path):
    """A checkpoint written by a packed_g run restores into BOTH layouts
    (identical param trees), and the two resumed runs continue
    equivalently — the 'checkpoints and RNG streams interchange' claim,
    driven through the real save/resume path. The continued epoch is
    compared packed-resume vs unpacked-resume (same restored state, one
    epoch of reassociation-scale divergence), not against a from-scratch
    oracle, so the tolerance stays tight."""
    from extended_gan_tpu.train.dcgan_driver import train

    common = dict(
        train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, seed=101, params={"ndf": 8, "save_epoch": 1},
    )
    out_a = str(tmp_path / "a")
    train(epochs=1, out_dir=out_a, packed_g=True, **common)
    out_b = str(tmp_path / "b")
    import shutil

    shutil.copytree(out_a, out_b)

    _, h_packed = train(epochs=2, out_dir=out_a, resume=True,
                        packed_g=True, **common)
    _, h_unpacked = train(epochs=2, out_dir=out_b, resume=True,
                          packed_g=False, **common)
    assert len(h_unpacked.history["pred_mse"]) == 2
    np.testing.assert_allclose(
        h_unpacked.history["pred_mse"], h_packed.history["pred_mse"],
        rtol=2e-3)
    np.testing.assert_allclose(
        h_unpacked.history["train_mse"], h_packed.history["train_mse"],
        rtol=2e-3)


@pytest.mark.slow
def test_grad_parity():
    g_u, v = _init(packed=False, dropout=0.0)
    g_p, _ = _init(packed=True, dropout=0.0)
    x = jnp.asarray(np.random.RandomState(4).rand(B, H, W, NC), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(5).rand(B, H, W, NC), jnp.float32)

    def loss(params, model):
        y, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean((y - tgt) ** 2)

    gu = jax.grad(loss)(v["params"], g_u)
    gp = jax.grad(loss)(v["params"], g_p)
    flat_u = jax.tree_util.tree_flatten_with_path(gu)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    assert [p for p, _ in flat_u] == [p for p, _ in flat_p]
    for (path, a), (_, b) in zip(flat_u, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=str(path))
