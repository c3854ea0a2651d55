"""Vanilla MLP GAN (MNIST-scale).

Capability clone of /root/reference/gan_examples/vanilla_gan.py:57-100,
re-built in flax: latent z(100) -> MLP -> (C, H, W) image in [-1, 1]; MLP
discriminator -> sigmoid probability.

Architecture notes preserved from the reference:
- BatchNorm layers are constructed as ``BatchNorm1d(out_feat, 0.8)``
  (vanilla_gan.py:64) — positionally that sets ``eps=0.8`` in torch. We
  reproduce eps=0.8 because the published behaviour depends on it.
- LeakyReLU slope 0.2 throughout; Tanh generator head; Sigmoid D head.

Everything is pure f32/bf16 matmuls — ideal MXU food once batched.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.initializers import torch_bias_init, torch_kernel_init
from ..ops.norm import TorchBatchNorm


def _torch_dense(x, width, dtype):
    """nn.Dense initialized like torch nn.Linear — kaiming_uniform(a=sqrt(5))
    kernels, U(-1/sqrt(fan_in), ..) biases — the distributions the reference
    actually trains from (its weights_init is a silent no-op; see
    ops/initializers.py)."""
    return nn.Dense(
        width, dtype=dtype,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(x.shape[-1]),
    )(x)


class MLPGenerator(nn.Module):
    img_shape: Sequence[int] = (1, 28, 28)
    latent_dim: int = 100
    widths: Sequence[int] = (128, 256, 512, 1024)
    bn_eps: float = 0.8  # torch positional-arg quirk, see module docstring
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, train: bool = True):
        x = z.astype(self.dtype)
        for i, width in enumerate(self.widths):
            x = _torch_dense(x, width, self.dtype)
            if i > 0:  # first block is not normalized (reference :69)
                x = TorchBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,  # == torch momentum 0.1
                    epsilon=self.bn_eps,
                    dtype=jnp.float32,
                    name=f"BatchNorm_{i - 1}",
                )(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        out_dim = 1
        for d in self.img_shape:
            out_dim *= d
        x = _torch_dense(x, out_dim, self.dtype)
        x = jnp.tanh(x.astype(jnp.float32))
        return x.reshape((x.shape[0], *self.img_shape))


class MLPDiscriminator(nn.Module):
    img_shape: Sequence[int] = (1, 28, 28)
    widths: Sequence[int] = (512, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, *, train: bool = True):
        x = img.reshape((img.shape[0], -1)).astype(self.dtype)
        for width in self.widths:
            x = _torch_dense(x, width, self.dtype)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = _torch_dense(x, 1, self.dtype)
        return nn.sigmoid(x.astype(jnp.float32))
