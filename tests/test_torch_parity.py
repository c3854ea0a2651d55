"""Numerical parity against torch (CPU) as an independent oracle.

The reference trains with torch ops; BASELINE.md demands MSE parity within
1%. These tests pin the semantics our kernels must match: conv padding,
BatchNorm train-mode statistics, BCE clamping, and torch-Adam weight decay.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_conv_same_padding_matches_torch():
    import flax.linen as nn

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)  # NCHW for torch
    w = rng.randn(8, 4, 4, 4).astype(np.float32)    # OIHW
    b = rng.randn(8).astype(np.float32)

    tconv = torch.nn.Conv2d(4, 8, 4, stride=1, padding="same")
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
    t_out = tconv(torch.from_numpy(x)).detach().numpy()

    conv = nn.Conv(8, kernel_size=(4, 4), strides=(1, 1), padding="SAME")
    # flax kernel layout: HWIO
    variables = {
        "params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    }
    j_out = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    j_out = np.moveaxis(np.asarray(j_out), -1, 1)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-5, atol=2e-5)


def test_strided_conv_explicit_padding_matches_torch():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 64, 64).astype(np.float32)
    w = rng.randn(16, 8, 4, 4).astype(np.float32)

    tconv = torch.nn.Conv2d(8, 16, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
    t_out = tconv(torch.from_numpy(x)).detach().numpy()

    conv = nn.Conv(16, kernel_size=(4, 4), strides=(2, 2),
                   padding=((1, 1), (1, 1)), use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    j_out = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    j_out = np.moveaxis(np.asarray(j_out), -1, 1)
    assert j_out.shape == t_out.shape == (2, 16, 32, 32)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)


def test_batchnorm_train_mode_matches_torch():
    """Our TorchBatchNorm matches torch BN bit-for-bit in BOTH the
    normalized output and the running statistics — including the UNBIASED
    running-variance update flax.linen.BatchNorm gets wrong (it stores the
    biased batch variance; torch applies the n/(n-1) Bessel factor)."""
    from extended_gan_tpu.ops.norm import TorchBatchNorm

    rng = np.random.RandomState(2)
    # small batch so the Bessel factor is visibly large (n = 8*10*10)
    x = rng.randn(8, 6, 10, 10).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
    tbn.train()
    t_out = tbn(torch.from_numpy(x)).detach().numpy()

    bn = TorchBatchNorm(use_running_average=False, momentum=0.9,
                        epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0),
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
    j_out, mutated = bn.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        mutable=["batch_stats"],
    )
    j_out = np.moveaxis(np.asarray(j_out), -1, 1)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)
    # running stats update: torch uses momentum 0.1 (new = 0.9 old + 0.1 cur)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_bce_matches_torch_including_clamp():
    from extended_gan_tpu.train.losses import bce

    p = np.array([0.0, 1e-9, 0.3, 0.9, 1.0], np.float32)
    t = np.array([1.0, 1.0, 0.0, 1.0, 0.0], np.float32)
    t_loss = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t))
    j_loss = float(bce(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(j_loss, float(t_loss), rtol=1e-5)


def test_adam_with_weight_decay_matches_torch():
    """torch Adam(weight_decay=wd) == our add_decayed_weights-before-adam
    chain (convolutional_gat/train.py:212 uses weight_decay=0.01)."""
    from extended_gan_tpu.train.optim import adam

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grad = np.array([0.1, 0.2, -0.3], np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-3, betas=(0.9, 0.999),
                            weight_decay=0.01)
    for _ in range(3):
        topt.zero_grad()
        tw.grad = torch.from_numpy(grad.copy())
        topt.step()

    tx = adam(1e-3, b1=0.9, b2=0.999, weight_decay=0.01)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(jnp.asarray(grad), state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_gat_layer_matches_naive_reference_math():
    """Our vectorized GraphAttentionLayer vs a naive numpy implementation
    of the same published GAT-with-learnable-adjacency math."""
    from extended_gan_tpu.models.gat.layers import GraphAttentionLayer

    rng = np.random.RandomState(3)
    N, V, F = 2, 5, 6
    h = rng.randn(N, V, F).astype(np.float32)
    layer = GraphAttentionLayer(in_features=F, out_features=F, n_vertices=V)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(h))
    out = np.asarray(layer.apply(variables, jnp.asarray(h)))

    W = np.asarray(variables["params"]["W"])
    a = np.asarray(variables["params"]["a"])[:, 0]
    B = np.asarray(variables["params"]["B"])

    def leaky(v):
        return np.where(v > 0, v, 0.2 * v)

    def softmax(v):
        e = np.exp(v - v.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    Wh = h @ W
    # naive pairwise concat construction
    e = np.zeros((N, V, V), np.float32)
    for n in range(N):
        for i in range(V):
            for j in range(V):
                e[n, i, j] = leaky(
                    np.concatenate([Wh[n, i], Wh[n, j]]) @ a)
    att = softmax(e)
    adj = B + np.eye(V, dtype=np.float32)
    adj = (adj - adj.min()) / (adj.max() - adj.min())
    d = adj.sum(axis=1)
    adj_n = adj / np.sqrt(np.outer(d, d))
    att = np.einsum("uv,nvw->nuw", adj_n, att)
    hp = np.einsum("nuv,nve->nue", att, Wh)
    expected = np.where(hp > 0, hp, np.expm1(hp))
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_bilinear_upsample_matches_torch_align_corners():
    """SmaAt-UNet's decoder upsampling must match the published
    nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)."""
    from extended_gan_tpu.models.smaat_unet import _resize

    rng = np.random.default_rng(0)
    for h, w in ((4, 4), (5, 7), (10, 10)):
        x = rng.random((2, h, w, 3), dtype=np.float32)
        got = np.asarray(_resize(x, 2 * h, 2 * w))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2, mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-6)
