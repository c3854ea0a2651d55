"""Parity shim for convolutional_gat/preprocessing/utils.py (listdir/mkdir)."""

from extended_gan_tpu.data.io import listdir, mkdir  # noqa: F401
