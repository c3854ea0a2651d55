"""Channel-tiled Pallas DSC kernel correctness (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.ops.pallas.dsconv import (
    _pallas_forward_tiled,
    _pick_tile,
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


def test_pick_tile():
    assert _pick_tile(8, 100) == 8       # fits whole
    assert _pick_tile(256, 128) == 128   # legal 128-tile
    assert _pick_tile(512, 300) == 256   # largest 128-multiple divisor
    assert _pick_tile(64, 16) == 64      # no legal sub-tile -> full axis


@pytest.mark.parametrize("kpl", [1, 2])
def test_tiled_kernel_matches_reference(kpl):
    rng = np.random.RandomState(0)
    args = _random_dsc(rng, 2, 8, 8, 8, kpl, 16)
    out = np.asarray(_pallas_forward_tiled(*args, interpret=True))
    ref = np.asarray(_reference_dsc(*args))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_large_channel_shape_routes_to_tiled_kernel():
    """A shape over the whole-image VMEM budget with >=256 channels runs
    the channel-tiled Pallas kernel and stays correct."""
    rng = np.random.RandomState(1)
    args = _random_dsc(rng, 1, 64, 64, 256, 1, 256)
    out = np.asarray(fused_dsconv(*args))
    ref = np.asarray(_reference_dsc(*args))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_oversized_spatial_falls_back_unfused():
    rng = np.random.RandomState(3)
    args = _random_dsc(rng, 1, 128, 128, 64, 2, 64)
    out = np.asarray(fused_dsconv(*args))  # must not OOM; any path is fine
    ref = np.asarray(_reference_dsc(*args))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_tiled_gradients_match():
    import jax

    rng = np.random.RandomState(2)
    args = _random_dsc(rng, 1, 32, 32, 256, 1, 256)

    def loss_fused(*a):
        return jnp.sum(fused_dsconv(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_dsc(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(1, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(1, 3))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
