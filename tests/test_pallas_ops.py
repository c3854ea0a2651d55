"""Pallas kernel correctness (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.ops.pallas.dsconv import (
    _reference_dsc,
    fused_dsconv,
)


def _random_dsc(rng, b, h, w, c, kpl, cout):
    x = rng.randn(b, h, w, c).astype(np.float32)
    dw = rng.randn(3, 3, c * kpl).astype(np.float32) * 0.2
    dwb = rng.randn(c * kpl).astype(np.float32) * 0.1
    pw = rng.randn(c * kpl, cout).astype(np.float32) * 0.2
    pwb = rng.randn(cout).astype(np.float32) * 0.1
    return tuple(jnp.asarray(a) for a in (x, dw, dwb, pw, pwb))


@pytest.mark.parametrize("kpl", [1, 2])
@pytest.mark.parametrize("shape", [(2, 8, 8, 4, 8), (1, 16, 16, 8, 16)])
def test_fused_dsconv_matches_reference(shape, kpl):
    b, h, w, c, cout = shape
    rng = np.random.RandomState(0)
    args = _random_dsc(rng, b, h, w, c, kpl, cout)
    fused = np.asarray(fused_dsconv(*args))
    ref = np.asarray(_reference_dsc(*args))
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-4)


def test_reference_dsc_matches_lax_grouped_conv():
    """The reference composition itself must equal XLA's grouped conv +
    1x1 conv (the flax path)."""
    rng = np.random.RandomState(1)
    b, h, w, c, kpl, cout = 2, 10, 10, 6, 2, 12
    x, dw, dwb, pw, pwb = _random_dsc(rng, b, h, w, c, kpl, cout)
    ref = np.asarray(_reference_dsc(x, dw, dwb, pw, pwb))
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, dw.reshape(3, 3, 1, c * kpl), (1, 1), ((1, 1), (1, 1)),
        feature_group_count=c, dimension_numbers=dn,
    ) + dwb
    y = jax.lax.conv_general_dilated(
        y, pw.reshape(1, 1, c * kpl, cout), (1, 1), "VALID",
        dimension_numbers=dn,
    ) + pwb
    np.testing.assert_allclose(ref, np.asarray(y), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_dsconv_gradients_match_unfused():
    rng = np.random.RandomState(2)
    args = _random_dsc(rng, 1, 8, 8, 4, 2, 8)

    def loss_fused(*a):
        return jnp.sum(fused_dsconv(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_dsc(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_dsconv_under_jit():
    rng = np.random.RandomState(3)
    args = _random_dsc(rng, 2, 8, 8, 4, 1, 4)
    f = jax.jit(fused_dsconv)
    np.testing.assert_allclose(
        np.asarray(f(*args)), np.asarray(_reference_dsc(*args)),
        rtol=1e-4, atol=1e-4,
    )


def test_vmem_fallback_for_large_shapes():
    """Oversized inputs must silently take the unfused path."""
    rng = np.random.RandomState(4)
    args = _random_dsc(rng, 1, 256, 256, 64, 2, 64)
    out = fused_dsconv(*args)  # must not OOM VMEM; falls back
    assert out.shape == (1, 256, 256, 64)


@pytest.mark.slow
def test_smaat_unet_pallas_path_matches_xla_path():
    from extended_gan_tpu.models.smaat_unet import SmaAt_UNet

    x = jnp.asarray(np.random.RandomState(5).rand(1, 16, 16, 4),
                    jnp.float32)
    m_xla = SmaAt_UNet(n_channels=4, n_classes=4, kernels_per_layer=1,
                       base=8, use_pallas=False)
    m_pl = SmaAt_UNet(n_channels=4, n_classes=4, kernels_per_layer=1,
                      base=8, use_pallas=True)
    v = m_xla.init(jax.random.PRNGKey(0), x, train=False)
    out_xla = m_xla.apply(v, x, train=False)
    out_pl = m_pl.apply(v, x, train=False)  # SAME params, different path
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-4)
