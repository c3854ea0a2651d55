"""SmaAt-UNet (Trebing, Stanczyk, Mehrkanoon 2021).

The reference imports this from the missing ``GAT3D/smaat_unet`` subpackage
(convolutional_gat/unet_model.py:4; contract reconstructed in SURVEY.md
section 2.6). Re-implemented here from the public architecture: a U-Net
whose double-convs are depthwise-separable and whose skip connections pass
through CBAM (channel + spatial attention) blocks; bilinear upsampling.

Measured footprint of the reference instance: 4,032,548 params
(convolutional_gat/compare_models/results/results.json) — the param-count
test pins our reconstruction to that number.

Layout: NHWC (TPU-native). Depthwise convs use feature_group_count;
see ops/pallas for the fused depthwise kernel used on the hot path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norm import TorchBatchNorm


class DepthwiseSeparableConv(nn.Module):
    """Depthwise kxk (grouped) + pointwise 1x1, shared params across two
    execution paths: the XLA pair of convs, or (``use_pallas=True``, k=3,
    stride 1) the single fused Pallas kernel from ops/pallas/dsconv."""

    nout: int
    kernels_per_layer: int = 1
    kernel_size: int = 3
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        k = self.kernel_size
        ckpl = nin * self.kernels_per_layer
        dw = self.param(
            "depthwise_kernel", nn.initializers.lecun_normal(),
            (k, k, 1, ckpl),
        )
        dwb = self.param("depthwise_bias", nn.initializers.zeros, (ckpl,))
        pw = self.param(
            "pointwise_kernel", nn.initializers.lecun_normal(),
            (1, 1, ckpl, self.nout),
        )
        pwb = self.param("pointwise_bias", nn.initializers.zeros,
                         (self.nout,))
        if k == 3:
            if self.use_pallas:
                from ..ops.pallas.dsconv import fused_dsconv

                return fused_dsconv(
                    x, dw[:, :, 0, :], dwb, pw[0, 0], pwb
                ).astype(self.dtype)
            # shift-add depthwise + einsum pointwise: XLA fuses this into
            # the same program shape as the Pallas kernel and it measures
            # ~4x faster than lax grouped-conv lowering at wide channels
            # (BENCH_NOTES.md)
            from ..ops.pallas.dsconv import shift_add_dsc

            return shift_add_dsc(
                x, dw[:, :, 0, :], dwb, pw[0, 0], pwb
            ).astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), dw.astype(self.dtype), (1, 1),
            ((k // 2, k // 2), (k // 2, k // 2)),
            feature_group_count=nin, dimension_numbers=dn,
        ) + dwb.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            y, pw.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=dn,
        ) + pwb.astype(self.dtype)
        return y


class DoubleConvDS(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    kernels_per_layer: int = 1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        mid = self.mid_channels or self.out_channels
        for i, ch in enumerate((mid, self.out_channels)):
            x = DepthwiseSeparableConv(
                ch, self.kernels_per_layer, use_pallas=self.use_pallas,
                dtype=self.dtype, name=f"dsc{i}",
            )(x)
            x = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class ChannelAttention(nn.Module):
    """CBAM channel gate: shared MLP over avg- and max-pooled descriptors."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        mlp = nn.Sequential(
            [
                nn.Dense(max(1, ch // self.reduction), dtype=self.dtype,
                         name="fc1"),
                nn.relu,
                nn.Dense(ch, dtype=self.dtype, name="fc2"),
            ]
        )
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        scale = nn.sigmoid((avg + mx).astype(jnp.float32))
        return x * scale[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial gate: 7x7 conv over [max, mean] channel pools + BN."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        pooled = jnp.stack(
            [jnp.max(x, axis=-1), jnp.mean(x, axis=-1)], axis=-1
        )
        s = nn.Conv(
            1, kernel_size=(7, 7), padding=((3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, name="conv",
        )(pooled)
        s = TorchBatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(s)
        return x * nn.sigmoid(s.astype(jnp.float32))


class CBAM(nn.Module):
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = ChannelAttention(self.reduction, dtype=self.dtype, name="channel")(x)
        x = SpatialAttention(dtype=self.dtype, name="spatial")(x, train=train)
        return x


def _resize(x, new_h, new_w):
    """Bilinear upsample with ``align_corners=True`` semantics.

    The published SmaAt-UNet upsamples with
    ``nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)``;
    ``jax.image.resize`` implements only half-pixel (align_corners=False)
    sampling, which shifts every non-center pixel — worst at the small
    bottleneck maps. Sample positions here are ``i * (n_in-1)/(n_out-1)``,
    matching torch exactly (tests/test_torch_parity.py pins it)."""

    def interp(a, axis, new):
        n = a.shape[axis]
        if new == n or n == 1:
            return jnp.repeat(a, new, axis=axis) if n == 1 else a
        u = jnp.linspace(0.0, n - 1.0, new, dtype=jnp.float32)
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
        w = (u - i0.astype(jnp.float32)).astype(a.dtype)
        lo = jnp.take(a, i0, axis=axis)
        hi = jnp.take(a, i0 + 1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = new
        w = w.reshape(shape)
        return lo * (1 - w) + hi * w

    return interp(interp(x, 1, new_h), 2, new_w)


class DownDS(nn.Module):
    out_channels: int
    kernels_per_layer: int = 1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConvDS(
            self.out_channels, kernels_per_layer=self.kernels_per_layer,
            use_pallas=self.use_pallas, dtype=self.dtype, name="conv",
        )(x, train=train)


class UpDS(nn.Module):
    out_channels: int
    kernels_per_layer: int = 1
    bilinear: bool = True
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, *, train: bool = True):
        if self.bilinear:
            x1 = _resize(x1, x1.shape[1] * 2, x1.shape[2] * 2)
            mid = (x1.shape[-1] + x2.shape[-1]) // 2
        else:
            x1 = nn.ConvTranspose(
                x1.shape[-1] // 2, kernel_size=(2, 2), strides=(2, 2),
                dtype=self.dtype, name="upconv",
            )(x1)
            mid = None
        # pad x1 to x2's spatial dims (odd-size inputs)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(
                x1,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2),
                 (0, 0)),
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConvDS(
            self.out_channels, mid_channels=mid,
            kernels_per_layer=self.kernels_per_layer,
            use_pallas=self.use_pallas, dtype=self.dtype, name="conv",
        )(x, train=train)


class SmaAt_UNet(nn.Module):
    """(B, H, W, n_channels) -> (B, H, W, n_classes). H, W >= 16."""

    n_channels: int = 4
    n_classes: int = 4
    kernels_per_layer: int = 2
    bilinear: bool = True
    reduction_ratio: int = 16
    base: int = 64
    use_pallas: bool = False
    # moe_experts > 0 adds a Switch-MoE residual FFN over the bottleneck
    # tokens (models/moe.py) — conditional capacity the reference never
    # had; the expert axis shards over the mesh (parallel/expert.py)
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        kpl = self.kernels_per_layer
        b_ = self.base
        factor = 2 if self.bilinear else 1
        x1 = DoubleConvDS(b_, kernels_per_layer=kpl,
                          use_pallas=self.use_pallas, dtype=self.dtype,
                          name="inc")(x, train=train)
        x1a = CBAM(self.reduction_ratio, dtype=self.dtype, name="cbam1")(
            x1, train=train)
        x2 = DownDS(b_ * 2, kpl, use_pallas=self.use_pallas, dtype=self.dtype, name="down1")(
            x1, train=train)
        x2a = CBAM(self.reduction_ratio, dtype=self.dtype, name="cbam2")(
            x2, train=train)
        x3 = DownDS(b_ * 4, kpl, use_pallas=self.use_pallas, dtype=self.dtype, name="down2")(
            x2, train=train)
        x3a = CBAM(self.reduction_ratio, dtype=self.dtype, name="cbam3")(
            x3, train=train)
        x4 = DownDS(b_ * 8, kpl, use_pallas=self.use_pallas, dtype=self.dtype, name="down3")(
            x3, train=train)
        x4a = CBAM(self.reduction_ratio, dtype=self.dtype, name="cbam4")(
            x4, train=train)
        x5 = DownDS(b_ * 16 // factor, kpl, use_pallas=self.use_pallas, dtype=self.dtype, name="down4")(
            x4, train=train)
        x5a = CBAM(self.reduction_ratio, dtype=self.dtype, name="cbam5")(
            x5, train=train)
        if self.moe_experts:
            from .moe import SwitchMoE

            x5a = SwitchMoE(
                num_experts=self.moe_experts,
                capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype, name="moe",
            )(x5a)
        x = UpDS(b_ * 8 // factor, kpl, self.bilinear, use_pallas=self.use_pallas,
                 dtype=self.dtype, name="up1")(x5a, x4a, train=train)
        x = UpDS(b_ * 4 // factor, kpl, self.bilinear, use_pallas=self.use_pallas,
                 dtype=self.dtype, name="up2")(x, x3a, train=train)
        x = UpDS(b_ * 2 // factor, kpl, self.bilinear, use_pallas=self.use_pallas,
                 dtype=self.dtype, name="up3")(x, x2a, train=train)
        x = UpDS(b_, kpl, self.bilinear, use_pallas=self.use_pallas,
                 dtype=self.dtype, name="up4")(x, x1a, train=train)
        return nn.Conv(
            self.n_classes, kernel_size=(1, 1), dtype=self.dtype, name="outc"
        )(x).astype(jnp.float32)
