"""Parity shim for convolutional_gat/data_loaders/kmni_data_loader.py."""

from extended_gan_tpu.data.streaming import (  # noqa: F401
    KmniLoader as DataLoader,
    get_kmni_loaders as get_loaders,
)
