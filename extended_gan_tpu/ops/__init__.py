from .initializers import (
    torch_kernel_init,
    torch_bias_init,
    dcgan_normal_init,
    conv_fan_in,
)

__all__ = [
    "torch_kernel_init",
    "torch_bias_init",
    "dcgan_normal_init",
    "conv_fan_in",
]
