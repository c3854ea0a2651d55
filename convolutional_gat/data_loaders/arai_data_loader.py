"""Parity shim for convolutional_gat/data_loaders/arai_data_loader.py."""

from extended_gan_tpu.data.streaming import (  # noqa: F401
    AraiLoader as DataLoader,
    get_arai_loaders as get_loaders,
)
