"""DCGAN-style frame-prediction GAN.

Capability clone of /root/reference/dcgan/model.py:19-179, built NHWC-first
for the TPU (channels-last feeds the MXU's native conv layout; the
reference's NCHW is a CUDA convention):

- :class:`ConvBlock` — Conv -> BatchNorm? -> channel Dropout(0.01) -> act
  (reference :19-52),
- :class:`Generator` — 5 same-padded 4x4 ConvBlocks nc->8nc->4nc->2nc->nc->nc
  with a sigmoid head; frames-as-channels, no latent z (reference :55-76),
- :class:`TemporalDiscriminator` — 5 stride-2/4 blocks on concat(x, y),
  LeakyReLU(0.2), sigmoid 1-logit head (reference :79-142),
- :class:`FrameDiscriminator` — classic DCGAN D on y alone (reference
  :145-179).

All inputs/outputs are (B, H, W, C) with C = frame count (nc=4).
Initialization matches torch defaults (see ops/initializers.py for why the
reference's weights_init is a no-op).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.initializers import conv_fan_in, torch_bias_init, torch_kernel_init
from ..ops.norm import TorchBatchNorm
from ..ops.space_to_depth import pack2, pack_conv_weights, packed_conv_same, unpack2


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "leaky_relu": leaky_relu_02,
    "sigmoid": nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": nn.elu,
    "identity": lambda x: x,
}


class _ConvParams(nn.Module):
    """Declares a conv's canonical (kh, kw, Cin, Cout) kernel [+ bias]
    WITHOUT applying it — used by the packed path so the param tree
    (names, shapes, init rng paths => init VALUES) is bit-identical to
    the nn.Conv it stands in for (name it "Conv_0")."""

    shape: tuple
    use_bias: bool
    fan_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init, self.shape,
                            jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(self.fan_in),
                              (self.shape[-1],), jnp.float32)
        return kernel, bias


class _PackedBN(nn.Module):
    """TorchBatchNorm (ops/norm.py) computed in the 2x2-packed layout.

    Stats are taken over (batch, packed-H, packed-W, phase) per ORIGINAL
    channel — the identical value set the unpacked module reduces — so
    params/batch_stats keep their canonical (C,) shapes and values
    (name it "BatchNorm_0")."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        c = xp.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        xf = xp.astype(jnp.float32)
        xg = xf.reshape(xf.shape[:3] + (4, c))  # phase-major -> (…,4,C)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = (0, 1, 2, 3)
            mean = jnp.mean(xg, axes)
            var = jnp.mean(jnp.square(xg - mean), axes)
            if not self.is_initializing():
                n = xg.size / c
                bessel = n / max(n - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel
        mean4, var4 = jnp.tile(mean, 4), jnp.tile(var, 4)
        y = (xf - mean4) * jax.lax.rsqrt(var4 + self.epsilon) \
            * jnp.tile(scale, 4) + jnp.tile(bias, 4)
        return y.astype(self.dtype) if self.dtype != jnp.float32 else y


class ConvBlock(nn.Module):
    """Conv2d -> BatchNorm? -> Dropout2d(p) -> activation.

    ``padding`` accepts "SAME" or an int (symmetric explicit padding),
    mirroring the reference's padding="same" / padding=1 usages.
    Dropout drops whole channels per sample (torch Dropout2d), implemented
    with broadcast_dims over H, W.

    ``packed=True`` (stride-1 SAME 4x4 blocks only) takes/returns the
    2x2 space-to-depth layout (B, H/2, W/2, 4C) and computes the SAME
    function with MXU-shaped convs (ops/space_to_depth.py). The param
    tree, init values, BN statistics/updates, and the dropout mask draw
    (same module paths => same derived rngs) are all identical to the
    unpacked block.
    """

    chout: int
    kernel_size: int = 4
    stride: int = 1
    padding: Any = 0
    use_bias: bool = True
    dropout: float = 0.01
    act: str = "relu"
    batchnorm: bool = True
    dtype: Any = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        if self.packed:
            return self._call_packed(x, train=train)
        chin = x.shape[-1]
        pad = (
            "SAME"
            if isinstance(self.padding, str)
            else ((self.padding, self.padding), (self.padding, self.padding))
        )
        x = nn.Conv(
            features=self.chout,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(conv_fan_in(self.kernel_size, chin)),
            dtype=self.dtype,
        )(x.astype(self.dtype))
        if self.batchnorm:
            # name kept as the flax auto-name so checkpoints/trees are stable
            x = TorchBatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="BatchNorm_0",
            )(x)
        if self.dropout > 0:
            x = nn.Dropout(
                rate=self.dropout,
                broadcast_dims=(1, 2),  # drop whole channels (Dropout2d)
                deterministic=not train,
            )(x)
        return ACTIVATIONS[self.act](x)

    def _call_packed(self, xp, *, train: bool):
        assert self.stride == 1 and self.kernel_size == 4 \
            and isinstance(self.padding, str), \
            "packed ConvBlock supports the stride-1 SAME 4x4 form only"
        chin = xp.shape[-1] // 4
        kernel, bias = _ConvParams(
            shape=(4, 4, chin, self.chout), use_bias=self.use_bias,
            fan_in=conv_fan_in(4, chin), name="Conv_0",
        )()
        wp = pack_conv_weights(kernel).astype(self.dtype)
        y = packed_conv_same(xp.astype(self.dtype), wp)
        if bias is not None:
            y = y + jnp.tile(bias, 4).astype(self.dtype)
        if self.batchnorm:
            y = _PackedBN(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="BatchNorm_0",
            )(y)
        if self.dropout > 0:
            # draw the mask at the UNPACKED broadcast shape (B,1,1,C) —
            # the same bernoulli draw from the same derived rng as the
            # unpacked block — then tile it across the 4 phases
            mask = nn.Dropout(
                rate=self.dropout,
                broadcast_dims=(1, 2),
                deterministic=not train,
            )(jnp.ones((y.shape[0], 1, 1, self.chout), jnp.float32))
            y = y * jnp.tile(mask, (1, 1, 1, 4)).astype(y.dtype)
        return ACTIVATIONS[self.act](y)


class Generator(nn.Module):
    """4 context frames (as channels) -> 4 predicted frames in [0, 1].

    ``dropout`` threads to every ConvBlock (reference default 0.01); 0
    disables it — used by the torch-parity e2e tests, where cross-framework
    dropout RNGs cannot agree.

    ``packed=True`` computes the identical function in 2x2 space-to-depth
    layout (ops/space_to_depth.py): the five stride-1 SAME 4x4 convs at
    full resolution with 4..32 channels become 3x3 convs at half
    resolution with 16..128 channels, feeding the 128-lane MXU fat
    contraction dims instead of starving it. Param tree, init values, BN
    statistics, and dropout draws are identical to the unpacked model, so
    checkpoints and RNG streams are interchangeable between the two modes.
    """

    nc: int = 4
    dropout: float = 0.01
    dtype: Any = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        nc = self.nc
        if self.packed:
            x = pack2(x)
        widths = (nc * 8, nc * 4, nc * 2, nc)
        for w in widths:
            x = ConvBlock(
                w, kernel_size=4, padding="SAME", act="relu",
                dropout=self.dropout, dtype=self.dtype, packed=self.packed,
            )(x, train=train)
        x = ConvBlock(
            nc,
            kernel_size=4,
            padding="SAME",
            act="sigmoid",
            batchnorm=False,
            dropout=self.dropout,
            dtype=self.dtype,
            packed=self.packed,
        )(x, train=train)
        if self.packed:
            x = unpack2(x)
        return x.astype(jnp.float32)


class TemporalDiscriminator(nn.Module):
    """Judges the joint (context, continuation) clip: input concat(x, y)
    with 2*nc channels -> scalar probability per sample."""

    nc: int = 4
    ndf: int = 64
    dropout: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xy, *, train: bool = True):
        ndf = self.ndf
        x = ConvBlock(
            ndf, 4, stride=2, padding=1, use_bias=False, batchnorm=False,
            act="leaky_relu", dropout=self.dropout, dtype=self.dtype,
        )(xy, train=train)
        for w in (2 * ndf, 4 * ndf, 8 * ndf):
            x = ConvBlock(
                w, 4, stride=2, padding=1, use_bias=False,
                act="leaky_relu", dropout=self.dropout, dtype=self.dtype,
            )(x, train=train)
        x = ConvBlock(
            1, 4, stride=4, padding=0, use_bias=False, batchnorm=False,
            act="sigmoid", dropout=self.dropout, dtype=self.dtype,
        )(x, train=train)
        # squeeze only the singleton map axes: a bare .squeeze() (as in the
        # reference, dcgan/model.py) collapses the batch axis too at B=1
        return x.astype(jnp.float32).squeeze(axis=(1, 2, 3))


class FrameDiscriminator(nn.Module):
    """Classic DCGAN discriminator on the predicted frames alone."""

    nc: int = 4
    ndf: int = 64
    dtype: Any = jnp.float32

    def _conv(self, features, k, s, p, x):
        return nn.Conv(
            features=features,
            kernel_size=(k, k),
            strides=(s, s),
            padding=((p, p), (p, p)),
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
        )(x)

    @nn.compact
    def __call__(self, y, *, train: bool = True):
        ndf = self.ndf
        counter = iter(range(3))
        bn = lambda x: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=f"BatchNorm_{next(counter)}",
        )(x)
        x = y.astype(self.dtype)
        x = leaky_relu_02(self._conv(ndf, 4, 2, 1, x))
        x = leaky_relu_02(bn(self._conv(ndf * 2, 4, 2, 1, x)))
        x = leaky_relu_02(bn(self._conv(ndf * 4, 4, 2, 1, x)))
        x = leaky_relu_02(bn(self._conv(ndf * 8, 4, 2, 1, x)))
        x = nn.sigmoid(self._conv(1, 4, 1, 0, x).astype(jnp.float32))
        return x.squeeze(axis=(1, 2, 3))
