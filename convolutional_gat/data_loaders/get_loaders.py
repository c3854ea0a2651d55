"""Parity shim for convolutional_gat/data_loaders/get_loaders.py."""

from extended_gan_tpu.data.streaming import get_loaders  # noqa: F401
