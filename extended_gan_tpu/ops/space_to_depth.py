"""Space-to-depth conv reformulation for small-channel full-res stacks.

The dcgan Generator (models/dcgan.py, reference dcgan/model.py:55-76)
runs five stride-1 SAME 4x4 convs at full 64x64 resolution with 4..32
channels. On the TPU these leave the 128-lane MXU nearly idle: the
component decomposition (scripts/probe_dcgan_decomp.py) attributes ~60%
of the fused train step's device time to the generator despite it having
~10x fewer FLOPs than the discriminators.

The classic fix: view (B, H, W, C) as (B, H/2, W/2, 4C) (2x2 pixel
phases packed into channels) and transform each 4x4 stride-1 kernel into
a 3x3 packed kernel with 4x the input AND output channels. The packed
conv computes the identical linear map (extra taps multiply structural
zeros, so values are exact up to float summation order) while feeding
the MXU 4x fatter contraction/lane dimensions.

Measured (v5e via relay, b32 64x64 f32, K=64 scan slope): the five convs
go 0.663 -> 0.523 ms (1.2-1.5x each), but pack2+unpack2 cost ~0.165 ms
per application, leaving a bare forward near-neutral. The mode ships
opt-in (``Generator(packed=True)``, ``--packed-g``) with exactness locked
by tests/test_packed_generator.py; it becomes a win if XLA fuses the
phase reshapes into neighbors or at geometries where conv time dominates
the fixed repack cost.

Derivation (pack_conv_weights): output phase (py,px) at packed cell
(i,j) is original output pixel (2i+py, 2j+px) = sum_{ky,kx}
w[ky,kx] * x[2i+py+ky-1, 2j+px+kx-1]   (SAME for k=4,s=1 pads lo=1,hi=2).
Writing the input pixel as packed cell (i+u, j+v) phase (qy,qx):
2(i+u)+qy = 2i+py+ky-1  =>  ky = 2u+qy-py+1; u spans {-1,0,1} => 3 taps.

Channel layout is phase-major: packed channel (2*dy+dx)*C + c.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H2, W2, dy, dx, C
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack2(xp: jax.Array) -> jax.Array:
    """Inverse of :func:`pack2`."""
    b, h2, w2, c4 = xp.shape
    c = c4 // 4
    x = xp.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def _selector() -> np.ndarray:
    """S[a, q, p, k] = 1 iff k == 2*(a-1) + q - p + 1 (a: packed tap,
    q: input phase, p: output phase, k: original kernel tap)."""
    s = np.zeros((3, 2, 2, 4), np.float32)
    for a in range(3):
        for q in range(2):
            for p in range(2):
                k = 2 * (a - 1) + q - p + 1
                if 0 <= k < 4:
                    s[a, q, p, k] = 1.0
    return s


_S = _selector()


def pack_conv_weights(w: jax.Array) -> jax.Array:
    """(4, 4, Cin, Cout) -> (3, 3, 4Cin, 4Cout), differentiable.

    Pure 0/1 einsum so gradients flow back to the canonical kernel; the
    kernel is tiny (<= 4*4*32*32 floats), so the transform is noise next
    to the convs it feeds.
    """
    s = jnp.asarray(_S, w.dtype)
    # a,b: packed taps; q,r: input phases (y,x); p,t: output phases (y,x)
    wp = jnp.einsum("aqpk,brtl,klio->abqriopt", s, s, w)
    kh, kw, cin, cout = w.shape
    # (a, b, qy, qx, cin, cout, py, px) -> (a, b, [qy qx cin], [py px cout])
    wp = wp.transpose(0, 1, 2, 3, 4, 6, 7, 5)
    return wp.reshape(3, 3, 4 * cin, 4 * cout)


def packed_conv_same(xp: jax.Array, wp: jax.Array) -> jax.Array:
    """Stride-1 conv of packed input with packed weights, pad (1,1)."""
    return jax.lax.conv_general_dilated(
        xp, wp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
