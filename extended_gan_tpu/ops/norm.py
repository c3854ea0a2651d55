"""Normalization layers with torch-exact semantics.

``flax.linen.BatchNorm`` updates the running variance with the BIASED batch
variance; ``torch.nn.BatchNorm2d`` normalizes with the biased variance but
updates the running estimate with the UNBIASED one (Bessel factor n/(n-1)).
The reference's published numbers were trained with torch BN
(/root/reference/dcgan/model.py:45, conda_environment.yml pins torch 1.10),
and eval-mode forward passes read the running stats — so exact eval parity
requires reproducing torch's update rule. The difference is n/(n-1) per
update: negligible for large spatial maps, ~0.2% for the 8x8 discriminator
tails, and it compounds over an epoch of updates.

:class:`TorchBatchNorm` is a drop-in replacement for the flax module at our
call sites (same param/batch_stats tree names when given the same ``name``),
keeping flax's momentum convention (flax 0.9 == torch 0.1).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch.nn.BatchNorm{1,2}d numerics exactly.

    - normalizes with the biased batch variance (torch, flax agree here),
    - updates running variance with the UNBIASED estimator (torch; flax
      uses biased),
    - stats and affine transform in float32 regardless of compute dtype.
    """

    use_running_average: bool
    momentum: float = 0.9  # flax convention: new = m * old + (1 - m) * cur
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((features,), jnp.float32),
        )
        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axes)
            # two-pass (torch's formulation), biased: used for normalization
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = xf.size / features
                bessel = n / max(n - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = (
                    m * ra_var.value + (1.0 - m) * var * bessel
                )
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype) if self.dtype != jnp.float32 else y
