"""Parameter initializers.

The reference's ``weights_init`` (dcgan/model.py:7-16) matches class names
lowercase ("conv"/"bn") against CamelCase torch classes — a silent no-op —
so its nets actually train from torch *defaults*: kaiming_uniform(a=sqrt(5))
for conv/linear weights, U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for biases.
To reproduce the published training behaviour we default to those
distributions; the intended-DCGAN normal(0, 0.02) init is also provided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torch kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_kernel_init = jax.nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)

dcgan_normal_init = jax.nn.initializers.normal(stddev=0.02)


def torch_bias_init(fan_in: int):
    """torch Conv/Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv_fan_in(kernel_size, in_features: int) -> int:
    k = np.prod(kernel_size) if hasattr(kernel_size, "__len__") else kernel_size**2
    return int(k * in_features)
