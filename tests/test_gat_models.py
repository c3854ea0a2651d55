import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.models.gat.baseline import BaselineModel, BaselineModel2D
from extended_gan_tpu.models.gat.gat3d import GATMultiHead3D, Model
from extended_gan_tpu.models.gat.layers import (
    GraphAttentionLayer,
    GraphAttentionLayer2D,
    normalized_adjacency,
    pairwise_scores,
)
from extended_gan_tpu.models.registry import build_model, model_classes
from extended_gan_tpu.models.smaat_unet import SmaAt_UNet
from extended_gan_tpu.models.unet_model import UnetModel

K = jax.random.PRNGKey(0)


def test_normalized_adjacency_properties():
    B = jnp.zeros((4, 4)) + 1e-6
    adj = normalized_adjacency(B)
    assert adj.shape == (4, 4)
    # with B ~ 0, adj ~ D^-1/2 I D^-1/2 = I
    np.testing.assert_allclose(np.asarray(adj), np.eye(4), atol=1e-4)


def test_pairwise_scores_decomposition():
    """e[b,i,j] must equal leaky_relu(concat(Wh_i, Wh_j) . a) — the
    reference's O(V^2) construction (baseline_model.py:58-65)."""
    rng = np.random.RandomState(0)
    Wh = rng.randn(2, 5, 3).astype(np.float32)
    a = rng.randn(6).astype(np.float32)
    e = np.asarray(pairwise_scores(jnp.asarray(Wh), jnp.asarray(a), 0.2))
    for b in range(2):
        for i in range(5):
            for j in range(5):
                raw = np.concatenate([Wh[b, i], Wh[b, j]]) @ a
                expected = raw if raw > 0 else 0.2 * raw
                assert abs(e[b, i, j] - expected) < 1e-5


def test_graph_attention_layer_shapes():
    layer = GraphAttentionLayer(in_features=12, out_features=12, n_vertices=5)
    x = jnp.ones((2, 5, 12))
    v = layer.init(K, x)
    out = layer.apply(v, x)
    assert out.shape == (2, 5, 12)
    # 4D input path: (N, C, T, V) with C*T = in_features
    x4 = jnp.ones((2, 3, 4, 5))
    out4 = layer.apply(v, x4)
    assert out4.shape == (2, 5, 12)


def test_graph_attention_layer_2d_shapes():
    layer = GraphAttentionLayer2D(in_features=4, out_features=4, n_vertices=5)
    x = jnp.ones((2, 9, 4, 5))  # (N, C, T, V)
    v = layer.init(K, x)
    out = layer.apply(v, x)
    assert out.shape == (2, 9, 4, 5)  # (N, C, E, V)


def test_baseline_models_shapes():
    for cls in (BaselineModel, BaselineModel2D):
        m = cls(image_width=6, image_height=6, n_vertices=5)
        x = jnp.ones((2, 6, 6, 4, 5))
        v = m.init(K, x)
        out = m.apply(v, x)
        assert out.shape == (2, 6, 6, 4, 5), cls.__name__
        assert (jnp.abs(out) <= 1).all()  # tanh head


@pytest.mark.parametrize("type_", ["temporal", "spatial", "multi_stream"])
@pytest.mark.parametrize("mapping", ["linear", "conv"])
def test_gat3d_block_shapes(type_, mapping):
    m = GATMultiHead3D(
        nfeat=4, nhid=4, alpha=0.2, nheads=2, type_=type_,
        mapping_type=mapping, image_height=8, image_width=8, n_vertices=6,
    )
    x = jnp.ones((2, 8, 8, 4, 6))
    v = m.init(K, x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 4, 6)


def test_gat3d_model_contract():
    m = Model(image_width=8, image_height=8, n_vertices=6,
              attention_type="temporal", mapping_type="conv")
    assert m.mapping_type == "conv"  # train.py:208 prints this
    x = jnp.ones((2, 8, 8, 4, 6))
    v = m.init(K, x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_gat3d_conv_param_footprint():
    """SURVEY 2.6 / compare_models/results/results.json: the reference's
    temporal-conv GAT measures exactly 43,936 params at the 20x20, T=4,
    V=6 geometry. Our reconstruction pins that number exactly: 4 heads x
    (10,956 conv-bottleneck mapping + 28 attention) = 43,936."""
    m = Model(image_width=20, image_height=20, n_vertices=6,
              attention_type="temporal", mapping_type="conv")
    v = m.init(K, jnp.ones((1, 20, 20, 4, 6)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    assert n == 43_936, n


@pytest.mark.slow
def test_smaat_unet_param_count_matches_reference():
    """compare_models/results/results.json: 4,032,548 params."""
    m = SmaAt_UNet(n_channels=4, n_classes=4, kernels_per_layer=2)
    v = m.init(K, jnp.zeros((1, 32, 32, 4)), train=False)
    n = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    assert n == 4_032_548, n


@pytest.mark.slow
def test_smaat_unet_forward_odd_size():
    m = SmaAt_UNet(n_channels=4, n_classes=4, kernels_per_layer=1, base=8)
    x = jnp.ones((1, 20, 20, 4))
    v = m.init(K, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 20, 20, 4)


@pytest.mark.slow
def test_unet_model_vertex_folding():
    m = UnetModel(image_width=16, image_height=16, n_vertices=3,
                  kernels_per_layer=1)
    x = jnp.ones((2, 16, 16, 4, 3))
    v = m.init(K, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 16, 16, 4, 3)


def test_registry_covers_reference_model_classes():
    for key in ("unet", "temporal", "spatial", "multi_stream"):
        assert key in model_classes
    m = build_model("temporal", image_width=8, image_height=8,
                    n_vertices=6, mapping_type="linear")
    assert m.mapping_type == "linear"


def test_registry_threads_use_pallas():
    """USE_PALLAS config key reaches the model (round-2 review: the fused
    kernels were unreachable from the production build path)."""
    from extended_gan_tpu.models.registry import build_model

    m = build_model("temporal", image_width=8, image_height=8, n_vertices=6,
                    mapping_type="conv", use_pallas=True)
    assert m.use_pallas is True
    u = build_model("unet", image_width=8, image_height=8, n_vertices=6,
                    mapping_type="conv", use_pallas=True)
    assert u.use_pallas is True
    # models without a Pallas path ignore the flag instead of raising
    b = build_model("baseline", image_width=8, image_height=8, n_vertices=6,
                    mapping_type="linear", use_pallas=True)
    assert b is not None
