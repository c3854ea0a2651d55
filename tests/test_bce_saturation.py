"""BCE gradient safety at sigmoid saturation (the bf16 NaN root cause)."""

import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.train.losses import bce


def test_bce_value_parity_at_zero():
    # torch BCELoss clamps log at -100 -> loss 100 at p=0, t=1
    assert float(bce(jnp.array([0.0]), 1.0)) == 100.0
    assert float(bce(jnp.array([1.0]), 0.0)) == 100.0


def test_bce_gradient_finite_at_saturation():
    for p0, t in ((0.0, 1.0), (1.0, 0.0), (0.0, 0.0), (1.0, 1.0)):
        g = jax.grad(lambda p: bce(p, t))(jnp.array([p0]))
        assert np.isfinite(np.asarray(g)).all(), (p0, t, g)


def test_bce_gradient_matches_analytic_in_normal_range():
    p = jnp.array([0.3])
    g = jax.grad(lambda q: bce(q, 1.0))(p)
    np.testing.assert_allclose(float(g[0]), -1.0 / 0.3, rtol=1e-5)
