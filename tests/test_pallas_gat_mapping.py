"""Fused conv-mapping bottleneck kernel: forward and gradient parity
with the XLA conv composition it replaces (ops/pallas/gat_mapping.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.ops.pallas.gat_mapping import fused_conv_bottleneck


def _xla_ref(x, k1, b1, k2, b2, k3, b3):
    dn = ("NHWC", "HWIO", "NHWC")
    hp = jax.lax.Precision.HIGHEST
    y = jax.lax.conv_general_dilated(x, k1, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     precision=hp) + b1
    y = jnp.maximum(y, 0.0)
    y = jax.lax.conv_general_dilated(y, k2, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     precision=hp) + b2
    y = jnp.maximum(y, 0.0)
    return jax.lax.conv_general_dilated(y, k3, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        precision=hp) + b3


def _make(n=6, h=20, cin=4, f=74, cout=4, seed=0):
    rng = np.random.RandomState(seed)
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    return (r(n, h, h, cin), r(3, 3, cin, f), r(f), r(1, 1, f, f), r(f),
            r(3, 3, f, cout), r(cout))


@pytest.mark.parametrize("n,h", [(6, 20), (4, 8), (8, 11)])
def test_forward_matches_xla(n, h):
    args = _make(n=n, h=h)
    out = fused_conv_bottleneck(*args)
    ref = _xla_ref(*args)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_odd_tile():
    # n not divisible by 8/4/2 -> tile 1 path
    args = _make(n=3, h=10)
    np.testing.assert_allclose(np.asarray(fused_conv_bottleneck(*args)),
                               np.asarray(_xla_ref(*args)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_gradients_match_xla():
    args = _make(n=4, h=12, f=33)

    def loss_fused(*a):
        return jnp.sum(fused_conv_bottleneck(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_xla_ref(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for name, a, b in zip("x k1 b1 k2 b2 k3 b3".split(), g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.slow
def test_vmap_over_heads():
    """nn.vmap integration shape: stacked head weights, shared x."""
    heads = 3
    args = [_make(n=4, h=10, seed=s) for s in range(heads)]
    x = args[0][0]
    stacked = [jnp.stack([a[i] for a in args]) for i in range(1, 7)]
    out = jax.vmap(
        lambda k1, b1, k2, b2, k3, b3: fused_conv_bottleneck(
            x, k1, b1, k2, b2, k3, b3)
    )(*stacked)
    for hh in range(heads):
        ref = _xla_ref(x, *(args[hh][i] for i in range(1, 7)))
        np.testing.assert_allclose(np.asarray(out[hh]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_model_level_parity_use_pallas():
    """Full temporal/conv GAT3D model: use_pallas=True (fused attention +
    fused mapping kernels) matches use_pallas=False (XLA composition) in
    forward AND parameter gradients, from IDENTICAL init params
    (_ConvParams registers nn.Conv-shaped params on the same RNG path)."""
    from extended_gan_tpu.models.gat.gat3d import Model

    rng = np.random.RandomState(3)
    hw, T, V = 10, 4, 6
    x = jnp.asarray(rng.rand(2, hw, hw, T, V).astype(np.float32))
    y = jnp.asarray(rng.rand(2, hw, hw, T, V).astype(np.float32))

    m_ref = Model(image_width=hw, image_height=hw, n_vertices=V,
                  attention_type="temporal", mapping_type="conv",
                  use_pallas=False)
    m_pal = Model(image_width=hw, image_height=hw, n_vertices=V,
                  attention_type="temporal", mapping_type="conv",
                  use_pallas=True, use_pallas_mapping=True)
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    p_pal = m_pal.init(jax.random.PRNGKey(0), x)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p_ref, p_pal)

    out_ref = m_ref.apply({"params": p_ref}, x)
    out_pal = m_pal.apply({"params": p_ref}, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=5e-5, atol=5e-5)

    def loss(m, p):
        return jnp.mean((m.apply({"params": p}, x) - y) ** 2)

    g_ref = jax.grad(lambda p: loss(m_ref, p))(p_ref)
    g_pal = jax.grad(lambda p: loss(m_pal, p))(p_ref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6),
        g_pal, g_ref)


def test_chanfirst_model_parity():
    """conv_impl='chanfirst' (positions-on-lanes XLA mapping) matches the
    nn.Conv path from identical params, forward and gradients."""
    from extended_gan_tpu.models.gat.gat3d import Model

    rng = np.random.RandomState(5)
    hw, T, V = 10, 4, 6
    x = jnp.asarray(rng.rand(2, hw, hw, T, V).astype(np.float32))
    y = jnp.asarray(rng.rand(2, hw, hw, T, V).astype(np.float32))
    m_ref = Model(image_width=hw, image_height=hw, n_vertices=V,
                  attention_type="temporal", mapping_type="conv")
    m_cf = Model(image_width=hw, image_height=hw, n_vertices=V,
                 attention_type="temporal", mapping_type="conv",
                 conv_impl="chanfirst")
    p = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    p_cf = m_cf.init(jax.random.PRNGKey(0), x)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p, p_cf)
    np.testing.assert_allclose(
        np.asarray(m_cf.apply({"params": p}, x)),
        np.asarray(m_ref.apply({"params": p}, x)), rtol=5e-5, atol=5e-5)

    def loss(m, pp):
        return jnp.mean((m.apply({"params": pp}, x) - y) ** 2)

    g_ref = jax.grad(lambda pp: loss(m_ref, pp))(p)
    g_cf = jax.grad(lambda pp: loss(m_cf, pp))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6),
        g_cf, g_ref)
