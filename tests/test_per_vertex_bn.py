import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.models.unet_model import UnetModel
import pytest


@pytest.mark.slow
def test_per_vertex_bn_shapes_and_shared_params():
    m = UnetModel(time_steps=4, kernels_per_layer=1, per_vertex_bn=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 4, 3),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 16, 16, 4, 3)
    # parameters are SHARED across vertices (no leading V axis)...
    some_kernel = jax.tree_util.tree_leaves(v["params"])[0]
    assert some_kernel.shape[0] != 3 or some_kernel.ndim <= 2
    # ...but batch stats are per-vertex (leading V axis)
    bs_leaf = jax.tree_util.tree_leaves(v["batch_stats"])[0]
    assert bs_leaf.shape[0] == 3


@pytest.mark.slow
def test_per_vertex_bn_matches_manual_per_vertex_loop():
    """vmapped per-vertex execution must equal running the folded model on
    each vertex separately with the same (shared) parameters.

    Eval mode compares tightly (BN uses running stats). Train mode is
    compared loosely: BN batch variances over a 2-sample batch amplify
    f32 reassociation noise through rsqrt."""
    m_pv = UnetModel(time_steps=4, kernels_per_layer=1, per_vertex_bn=True)
    m_fold = UnetModel(time_steps=4, kernels_per_layer=1,
                       per_vertex_bn=False)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 4, 3),
                    jnp.float32)
    v_pv = m_pv.init(jax.random.PRNGKey(7), x, train=False)
    out_pv_eval = m_pv.apply(v_pv, x, train=False)
    out_pv_train, _ = m_pv.apply(
        v_pv, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)},
    )

    # build folded-model variables from the shared per-vertex params
    v_fold0 = m_fold.init(jax.random.PRNGKey(7), x, train=False)
    v_fold = {"params": v_pv["params"]["shared"],
              "batch_stats": v_fold0["batch_stats"]}
    for k in range(3):
        xk = x[:, :, :, :, k : k + 1]  # single-vertex input
        out_k_eval = m_fold.apply(v_fold, xk, train=False)
        np.testing.assert_allclose(
            np.asarray(out_pv_eval[:, :, :, :, k]),
            np.asarray(out_k_eval[:, :, :, :, 0]),
            rtol=1e-5, atol=1e-6,
        )
        out_k_train, _ = m_fold.apply(
            v_fold, xk, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        np.testing.assert_allclose(
            np.asarray(out_pv_train[:, :, :, :, k]),
            np.asarray(out_k_train[:, :, :, :, 0]),
            atol=5e-2,
        )
