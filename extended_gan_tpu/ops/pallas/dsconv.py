"""Fused depthwise-separable convolution (Pallas TPU kernel).

The SmaAt-UNet hot op: every DoubleConvDS runs depthwise 3x3 (VPU work)
followed by pointwise 1x1 (MXU work) — in XLA these are two convolutions
with an HBM round-trip of the (H, W, C*kpl) intermediate between them. This
kernel fuses them: the depthwise result stays in VMEM and feeds the MXU
matmul directly.

Layout: NHWC, SAME padding, stride 1. Grid over the batch axis; each grid
step holds one padded (H+2, W+2, C) image in VMEM, computes the 3x3
depthwise conv as 9 shifted multiply-accumulates on the VPU, then one
(H*W, C*kpl) @ (C*kpl, Cout) matmul on the MXU.

Channel ordering: the public op takes flax grouped-conv weights (depthwise
output channel g*kpl + j reads input channel g). Inside the kernel the
intermediate uses tiled order (j*C + g) so the input expansion is a plain
concat; the weight permutation happens once outside the kernel.

Training integrates via jax.custom_vjp: forward = this kernel, backward =
XLA's gradient of the unfused reference composition (identical math).
Falls back to the reference composition when shapes exceed the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget guard: padded input + intermediate + output, f32.
_VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def _reference_dsc(x, dw_kernel, dw_bias, pw_kernel, pw_bias):
    """Unfused composition (the exact math the kernel must match).

    x: (B, H, W, C); dw_kernel: (3, 3, C*kpl) with grouped-interleaved
    channel order (output channel g*kpl + j reads input channel g, flax
    feature_group_count semantics); pw_kernel: (C*kpl, Cout).
    """
    c = x.shape[-1]
    ckpl = dw_kernel.shape[-1]
    kpl = ckpl // c
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    x_rep = jnp.repeat(xp, kpl, axis=-1)
    acc = jnp.zeros(x.shape[:3] + (ckpl,), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + (
                x_rep[:, di : di + h, dj : dj + w, :].astype(jnp.float32)
                * dw_kernel[di, dj, :].astype(jnp.float32)
            )
    acc = acc + dw_bias.astype(jnp.float32)
    out = jnp.einsum(
        "bhwk,ko->bhwo", acc, pw_kernel.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out + pw_bias.astype(jnp.float32)


def _dsc_kernel(x_ref, dw_ref, dwb_ref, pw_ref, pwb_ref, out_ref, *, kpl):
    # x_ref: (1, H+2, W+2, C) pre-padded; dw/dwb in TILED channel order;
    # out_ref: (1, H, W, Cout)
    _, hp, wp, c = x_ref.shape
    h, w = hp - 2, wp - 2
    ckpl = dw_ref.shape[-1]
    cout = out_ref.shape[-1]

    x = x_ref[0]
    if kpl > 1:
        x_rep = jnp.concatenate([x] * kpl, axis=-1)  # tiled order j*C + g
    else:
        x_rep = x
    acc = jnp.zeros((h, w, ckpl), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + (
                x_rep[di : di + h, dj : dj + w, :].astype(jnp.float32)
                * dw_ref[di, dj, :].astype(jnp.float32)
            )
    acc = acc + dwb_ref[0].astype(jnp.float32)
    out = jnp.dot(
        acc.reshape(h * w, ckpl),
        pw_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(h, w, cout)
    out_ref[0] = out + pwb_ref[0].astype(jnp.float32)


def _tile_order(c: int, kpl: int) -> np.ndarray:
    """Permutation mapping tiled index (j*C + g) -> grouped index
    (g*kpl + j)."""
    return np.asarray(
        [g * kpl + j for j in range(kpl) for g in range(c)], np.int32
    )


def _pallas_forward(x, dw_kernel, dw_bias, pw_kernel, pw_bias, *,
                    interpret=False):
    b, h, w, c = x.shape
    ckpl = dw_kernel.shape[-1]
    kpl = ckpl // c
    cout = pw_kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2

    # permute weights from grouped to tiled channel order (outside kernel)
    order = _tile_order(c, kpl)
    dw_t = dw_kernel[:, :, order]
    dwb_t = dw_bias[order].reshape(1, ckpl)
    pw_t = pw_kernel[order, :]
    pwb = pw_bias.reshape(1, cout)

    kernel = functools.partial(_dsc_kernel, kpl=kpl)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ckpl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckpl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ckpl, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * (h * w * ckpl * 9 * 2 + 2 * h * w * ckpl * cout),
            bytes_accessed=4 * b * (hp * wp * c + h * w * cout)
            + 4 * (9 * ckpl + ckpl * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, dw_t, dwb_t, pw_t, pwb)


def _fits_vmem(x, dw_kernel, pw_kernel) -> bool:
    hp, wp, c = x.shape[1] + 2, x.shape[2] + 2, x.shape[3]
    ckpl = dw_kernel.shape[-1]
    kpl = ckpl // c
    cout = pw_kernel.shape[-1]
    h, w = hp - 2, wp - 2
    per_image = 4 * (
        hp * wp * c * (1 + kpl) + h * w * (ckpl + cout)
    )
    return per_image + 4 * ckpl * cout < _VMEM_LIMIT_BYTES


def _fused_dsconv_impl(x, dw_kernel, dw_bias, pw_kernel, pw_bias):
    if not _fits_vmem(x, dw_kernel, pw_kernel):
        return _reference_dsc(x, dw_kernel, dw_bias, pw_kernel, pw_bias)
    interpret = jax.default_backend() != "tpu"
    return _pallas_forward(
        x, dw_kernel, dw_bias, pw_kernel, pw_bias, interpret=interpret
    )


@jax.custom_vjp
def fused_dsconv(x, dw_kernel, dw_bias, pw_kernel, pw_bias):
    """Depthwise-3x3 (+bias) -> pointwise-1x1 (+bias), SAME padding,
    stride 1, fused in one Pallas kernel. f32 output."""
    return _fused_dsconv_impl(x, dw_kernel, dw_bias, pw_kernel, pw_bias)


def _fwd(x, dw_kernel, dw_bias, pw_kernel, pw_bias):
    out = _fused_dsconv_impl(x, dw_kernel, dw_bias, pw_kernel, pw_bias)
    return out, (x, dw_kernel, dw_bias, pw_kernel, pw_bias)


def _bwd(residuals, g):
    # backward through the mathematically-identical unfused composition
    _, vjp = jax.vjp(_reference_dsc, *residuals)
    return vjp(g)


fused_dsconv.defvjp(_fwd, _bwd)
