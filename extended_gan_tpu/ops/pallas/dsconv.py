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


def _dsc_tiled_kernel(x_ref, dw_ref, dwb_ref, pw_ref, pwb_ref, out_ref, *,
                      kpl):
    """Channel-tiled variant: grid (B, Cout tiles, Cin tiles).

    Weights arrive with the j (kernels-per-layer) axis split out:
    dw (3, 3, kpl, Tc), dwb (kpl, Tc), pw (kpl, Tc, Tco), pwb (1, Tco).
    The output block is revisited across the innermost (Cin-tile) grid
    axis and accumulated in VMEM.
    """
    _, hp, wp, tc = x_ref.shape
    h, w = hp - 2, wp - 2
    tco = out_ref.shape[-1]
    ci = pl.program_id(2)
    n_ci = pl.num_programs(2)

    x = x_ref[0]
    acc_out = jnp.zeros((h * w, tco), jnp.float32)
    for j in range(kpl):
        acc = jnp.zeros((h, w, tc), jnp.float32)
        for di in range(3):
            for dj in range(3):
                acc = acc + (
                    x[di : di + h, dj : dj + w, :].astype(jnp.float32)
                    * dw_ref[di, dj, j, :].astype(jnp.float32)
                )
        acc = acc + dwb_ref[j].astype(jnp.float32)
        acc_out = acc_out + jnp.dot(
            acc.reshape(h * w, tc),
            pw_ref[j].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ci == 0)
    def _():
        out_ref[0] = (
            acc_out.reshape(h, w, tco) + pwb_ref[0].astype(jnp.float32)
        )

    @pl.when(ci != 0)
    def _():
        out_ref[0] = out_ref[0] + acc_out.reshape(h, w, tco)


def _pick_tile(total: int, budget: int) -> int:
    """Largest legal channel tile <= budget.

    Mosaic requires the minormost block dim to be a multiple of 128 or the
    full axis size, so valid tiles are ``total`` itself or 128*k divisors.
    Returns ``total`` (no tiling) when no smaller legal tile exists.
    """
    if total <= budget:
        return total
    k = budget // 128
    while k >= 1:
        if total % (128 * k) == 0:
            return 128 * k
        k -= 1
    return total


def _pallas_forward_tiled(x, dw_kernel, dw_bias, pw_kernel, pw_bias, *,
                          interpret=False):
    """Cin/Cout-tiled fused DSC for shapes whose whole-channel footprint
    exceeds VMEM. Same grouped-order weights as the public op; the kpl axis
    is split outside the kernel so each Cin tile is contiguous."""
    b, h, w, c = x.shape
    ckpl = dw_kernel.shape[-1]
    kpl = ckpl // c
    cout = pw_kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2

    # budget ~3MB per channel-tile buffer (128-channel tiles stay legal at
    # spatial sizes up to ~76x76)
    tc = _pick_tile(c, max(1, (3 << 20) // (4 * hp * wp)))
    tco = _pick_tile(cout, max(1, (3 << 20) // (4 * h * w)))
    # total VMEM footprint with the chosen tiles must fit
    need = 4 * (
        hp * wp * tc + h * w * tc + h * w * tco
        + kpl * tc * tco + 9 * kpl * tc
    )
    if need > 12 * (1 << 20):
        return _reference_dsc(x, dw_kernel, dw_bias, pw_kernel, pw_bias)

    # grouped order (g*kpl + j) -> split axes (j, g): dw[:, :, j, g]
    dw_split = dw_kernel.reshape(3, 3, c, kpl).transpose(0, 1, 3, 2)
    dwb_split = dw_bias.reshape(c, kpl).T  # (kpl, C)
    pw_split = pw_kernel.reshape(c, kpl, cout).transpose(1, 0, 2)
    pwb = pw_bias.reshape(1, cout)

    kernel = functools.partial(_dsc_tiled_kernel, kpl=kpl)
    return pl.pallas_call(
        kernel,
        grid=(b, cout // tco, c // tc),
        in_specs=[
            pl.BlockSpec((1, hp, wp, tc), lambda i, co, ci: (i, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, kpl, tc), lambda i, co, ci: (0, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpl, tc), lambda i, co, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpl, tc, tco), lambda i, co, ci: (0, ci, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tco), lambda i, co, ci: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, tco), lambda i, co, ci: (i, 0, 0, co),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * (h * w * ckpl * 9 * 2 + 2 * h * w * ckpl * cout),
            bytes_accessed=4 * b * (hp * wp * c * (cout // tco)
                                    + h * w * cout)
            + 4 * (9 * ckpl + ckpl * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, dw_split, dwb_split, pw_split, pwb)


def _pad_tile(minor: int, second_minor: int) -> int:
    """Elements Mosaic actually allocates for a (second_minor, minor)
    trailing pair: the minormost dim pads to 128 lanes, the
    second-minormost to 8 sublanes (f32 tiling)."""
    return (-(-minor // 128) * 128) * (-(-second_minor // 8) * 8)


def _fits_vmem(x, dw_kernel, pw_kernel) -> bool:
    # Count PADDED footprints, not logical elements: a narrow channel dim
    # (e.g. c=4) pads to 128 lanes, so the real VMEM cost can be ~30x the
    # logical one — the logical estimate let such inputs through and then
    # failed at Mosaic allocation instead of falling back gracefully.
    hp, wp, c = x.shape[1] + 2, x.shape[2] + 2, x.shape[3]
    ckpl = dw_kernel.shape[-1]
    kpl = ckpl // c
    cout = pw_kernel.shape[-1]
    h, w = hp - 2, wp - 2
    per_image = 4 * (
        hp * _pad_tile(c, wp)               # padded input
        + hp * _pad_tile(c * kpl, wp)       # replicated input
        + h * _pad_tile(ckpl, w)            # depthwise accumulator
        + h * _pad_tile(cout, w)            # output
    )
    return per_image + 4 * _pad_tile(cout, ckpl) < _VMEM_LIMIT_BYTES


def _fused_dsconv_impl(x, dw_kernel, dw_bias, pw_kernel, pw_bias):
    interpret = jax.default_backend() != "tpu"
    if not _fits_vmem(x, dw_kernel, pw_kernel):
        # channel-tiled kernel: spatial plane must still fit (one 2MB tile)
        hp, wp = x.shape[1] + 2, x.shape[2] + 2
        if 4 * hp * wp <= (2 << 20):
            return _pallas_forward_tiled(
                x, dw_kernel, dw_bias, pw_kernel, pw_bias,
                interpret=interpret,
            )
        return _reference_dsc(x, dw_kernel, dw_bias, pw_kernel, pw_bias)
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

# Public alias: the shift-add composition is also the fastest pure-XLA
# formulation of the fused DSC (XLA fuses the 9 shifted multiply-adds with
# the pointwise einsum; ~4x faster than lax grouped-conv lowering at wide
# channels) — models use it as the default non-Pallas path.
shift_add_dsc = _reference_dsc
