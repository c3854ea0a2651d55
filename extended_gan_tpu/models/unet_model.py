"""Per-vertex SmaAt-UNet frame predictor.

Parity with /root/reference/convolutional_gat/unet_model.py:8-29: a single
shared SmaAt_UNet(n_channels=4, n_classes=4) applied to every vertex's
(T-as-channels) frame stack.

TPU-first: the reference loops over vertices in Python (unet_model.py:22-29)
— six separate forward graphs per batch. Here the vertex axis folds into the
batch axis and the UNet runs ONCE on a (B*V, H, W, T) batch: bigger matmuls
for the MXU, one fused program. Deviation: BatchNorm batch statistics are
computed over B*V samples rather than per-vertex; with the reference's BN
momentum this changes training noise, not capability.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .smaat_unet import SmaAt_UNet


class _UNetShim(nn.Module):
    """SmaAt-UNet with the train flag as a construction attribute, so it can
    live under lifted transforms (nn.vmap drops call-time kwargs).
    Attributes don't affect the param tree, so train/eval instances share
    variables."""

    time_steps: int
    kernels_per_layer: int
    train: bool
    dtype: Any
    use_pallas: bool = False
    moe_experts: int = 0

    @nn.compact
    def __call__(self, x):
        return SmaAt_UNet(
            n_channels=self.time_steps, n_classes=self.time_steps,
            kernels_per_layer=self.kernels_per_layer, dtype=self.dtype,
            use_pallas=self.use_pallas, moe_experts=self.moe_experts,
            name="unet",
        )(x, train=self.train)


class UnetModel(nn.Module):
    """``per_vertex_bn=False`` (default): the vertex axis folds into the
    batch — one MXU-sized forward, BN statistics pooled over B*V samples.

    ``per_vertex_bn=True``: reference-exact BatchNorm semantics — the
    shared-parameter UNet is vmapped over the vertex axis with per-vertex
    ``batch_stats`` (the reference's Python loop computes BN per vertex,
    unet_model.py:22-29)."""

    image_width: int = 0
    image_height: int = 0
    n_vertices: int = 0
    attention_type: str = "unet"   # accepted for registry-call parity
    mapping_type: str = "conv"
    time_steps: int = 4
    kernels_per_layer: int = 2     # matches the reference's 4,032,548 params
    per_vertex_bn: bool = False
    use_pallas: bool = False       # fused Pallas DSC kernels in the UNet
    moe_experts: int = 0           # Switch-MoE bottleneck (models/moe.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        b, h, w, t, v = x.shape
        if self.per_vertex_bn:
            VU = nn.vmap(
                _UNetShim,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": None, "batch_stats": 0,
                               "losses": 0},
                split_rngs={"params": False, "dropout": True},
            )
            xv = x.transpose(4, 0, 1, 2, 3)  # (V, B, H, W, T)
            y = VU(
                time_steps=self.time_steps,
                kernels_per_layer=self.kernels_per_layer,
                train=train, dtype=self.dtype,
                use_pallas=self.use_pallas,
                moe_experts=self.moe_experts, name="shared",
            )(xv)
            return y.transpose(1, 2, 3, 4, 0)
        xb = x.transpose(0, 4, 1, 2, 3).reshape(b * v, h, w, t)
        y = SmaAt_UNet(
            n_channels=self.time_steps, n_classes=self.time_steps,
            kernels_per_layer=self.kernels_per_layer, dtype=self.dtype,
            use_pallas=self.use_pallas, moe_experts=self.moe_experts,
            name="unet",
        )(xb, train=train)
        return y.reshape(b, v, h, w, t).transpose(0, 2, 3, 4, 1)
