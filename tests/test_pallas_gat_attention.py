"""Fused GAT attention kernel: parity with the unfused JAX composition
(forward AND gradients), at the op, head, and model level."""

import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.models.gat.gat3d import GAT3DHead, Model
from extended_gan_tpu.models.gat.layers import normalized_adjacency
import pytest

from extended_gan_tpu.ops.pallas.gat_attention import (
    _reference_impl,
    attend_temporal_pallas,
    fused_gat_attention,
)

K = jax.random.PRNGKey(0)


def test_kernel_matches_reference_impl():
    rng = np.random.RandomState(0)
    B, M, G, S = 3, 4, 6, 25  # groups=vertices, group_size=HW
    m = jnp.asarray(rng.randn(B, M, G * S).astype(np.float32))
    w1 = jnp.asarray(np.repeat(rng.randn(G), S).astype(np.float32))[None, :]
    w2 = jnp.asarray(np.repeat(rng.randn(G), S).astype(np.float32))[None, :]
    adj = normalized_adjacency(
        jnp.asarray(rng.rand(M, M).astype(np.float32)))
    out = fused_gat_attention(m, w1, w2, adj, 0.2, S)
    ref = _reference_impl(m, w1, w2, adj, 0.2, S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_kernel_gradients_match_reference():
    rng = np.random.RandomState(1)
    B, M, G, S = 2, 4, 6, 16
    m = jnp.asarray(rng.randn(B, M, G * S).astype(np.float32))
    w1 = jnp.asarray(np.repeat(rng.randn(G), S).astype(np.float32))[None, :]
    w2 = jnp.asarray(np.repeat(rng.randn(G), S).astype(np.float32))[None, :]
    adj = normalized_adjacency(
        jnp.asarray(rng.rand(M, M).astype(np.float32)))

    def loss_fused(m, w1, w2, adj):
        return jnp.sum(fused_gat_attention(m, w1, w2, adj, 0.2, S) ** 2)

    def loss_ref(m, w1, w2, adj):
        return jnp.sum(_reference_impl(m, w1, w2, adj, 0.2, S) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(m, w1, w2, adj)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(m, w1, w2, adj)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_attend_wrapper_matches_head_math():
    """attend_temporal_pallas == elu(GAT3DHead._attend temporal path)."""
    rng = np.random.RandomState(2)
    B, H, W, T, V = 2, 10, 10, 4, 6
    mapped = jnp.asarray(rng.randn(B, H, W, T, V).astype(np.float32))
    a = jnp.asarray(rng.randn(2 * V).astype(np.float32))
    Badj = jnp.asarray(rng.rand(T, T).astype(np.float32))
    adj_n = normalized_adjacency(Badj)

    out = attend_temporal_pallas(mapped, a, adj_n, 0.2)

    # unfused math (gat3d.GAT3DHead._attend + elu)
    f = jnp.mean(mapped, axis=(1, 2))
    s1, s2 = f @ a[:V], f @ a[V:]
    e = jax.nn.leaky_relu(s1[:, :, None] + s2[:, None, :],
                          negative_slope=0.2)
    att = jax.nn.softmax(e, axis=-1)
    att = jnp.einsum("uv,nvw->nuw", adj_n, att)
    ref = jax.nn.elu(jnp.einsum("bts,bhwsv->bhwtv", att, mapped))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_head_use_pallas_matches_unfused():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 12, 12, 4, 6).astype(np.float32))
    head = GAT3DHead(nfeat=4, nhid=4, n_vertices=6, type_="temporal",
                     mapping_type="conv")
    head_p = GAT3DHead(nfeat=4, nhid=4, n_vertices=6, type_="temporal",
                       mapping_type="conv", use_pallas=True)
    v = head.init(K, x)
    out = head.apply(v, x)
    out_p = head_p.apply(v, x)  # same params, fused path
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_model_use_pallas_matches_unfused_with_grads():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 12, 12, 4, 6).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 12, 12, 4, 6).astype(np.float32))
    mk = lambda p: Model(image_width=12, image_height=12, n_vertices=6,
                         attention_type="temporal", mapping_type="conv",
                         use_pallas=p)
    v = mk(False).init(K, x)

    def loss(variables, model):
        return jnp.mean((model.apply(variables, x) - y) ** 2)

    l0, g0 = jax.value_and_grad(loss)(v, mk(False))
    l1, g1 = jax.value_and_grad(loss)(v, mk(True))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)
