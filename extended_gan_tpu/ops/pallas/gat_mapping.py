"""Fused conv-mapping bottleneck — the GAT3D hot path in ONE Pallas kernel.

The conv mapping (models/gat/gat3d.py::_Mapping, the TPU rebuild of the
reference's per-head conv modules at
/root/reference/convolutional_gat/model.py:21-31) is a 3x3 -> 1x1 -> 3x3
bottleneck with hidden width 74. Run as XLA convs, every intermediate
(B*V, H, W, 74) activation round-trips HBM between layers; at the
headline geometry (b32, 20x20, T=4, V=6) probe_gat_decomp.py measured
the whole train step AT its HBM roofline (2.017 ms measured vs a 2.19 ms
bytes-accessed bound, ~1.8 GB/step) with the mapping forward+backward
owning ~1.0 ms of it. The arithmetic is trivial (19 GF/step = 0.4 ms
even at the chip's f32 matmul rate); the BYTES are the whole story.
This kernel keeps the entire per-image activation chain in VMEM:
steady-state traffic is one read of x and one write of the output.

Layout trick (no reshapes, no transposes in-kernel): each (H, H, C)
image is zero-padded to (H+2, H+2, C), flattened to rows, and given a
zero apron (23 leading rows, trailing rows up to an 8-aligned stride).
A 3x3 SAME conv is then NINE equal-length shifted row-slices times
(C_in, C_out) weight matrices:

    out[r] = sum_{dy,dx} in[r + (H+2)*dy + dx] @ W[dy, dx]

A row shift of k = (H+2)*dy + dx (|k| <= H+3 <= apron) never lets a
VALID output row read outside its own image block, and ring/apron
garbage rows are re-zeroed by a precomputed 0/1 row mask before the
next 3x3 layer. Images stack along the row axis with a uniform stride,
so ONE slice shifts every image in the grid cell at once. All compute
is 2-D matmuls on (rows, channels) operands — exactly what Mosaic
lowers best — and the 74-wide intermediates never leave VMEM.

The backward kernel recomputes h1/h2 from x in VMEM (recompute FLOPs
are noise next to the bytes saved) and emits dx plus all six
weight/bias cotangents, accumulated across grid cells into
constant-index output blocks. Gradients match jax.grad of the XLA conv
composition (tests/test_pallas_gat_mapping.py). Heads are batched by
plain jax.vmap over the custom_vjp'd op (Flax's nn.vmap head axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAD = 23  # leading zero-apron rows; >= the largest negative shift H+3
_HP = jax.lax.Precision.HIGHEST


def _geom(h: int):
    """(padded side, 8-aligned rows-per-image) for square side h."""
    ph = h + 2
    rows = _LEAD + ph * ph + _LEAD
    rows += (-rows) % 8
    return ph, rows


def _shifts(ph: int):
    """Row shifts of a 3x3 conv in (ph, ph)-flattened coordinates,
    (dy, dx) row-major — the order HWIO kernels flatten to."""
    return [dy * ph + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _row_mask(h: int, n_images: int) -> np.ndarray:
    """(n_images * rows, 1) f32: 1 on rows holding real pixels."""
    ph, rows = _geom(h)
    m = np.zeros((rows,), np.float32)
    grid = np.zeros((ph, ph), np.float32)
    grid[1:h + 1, 1:h + 1] = 1.0
    m[_LEAD:_LEAD + ph * ph] = grid.reshape(-1)
    return np.tile(m, n_images)[:, None]


def _pack(x):
    """(N, H, H, C) -> (N * rows, C) apron-padded row layout."""
    n, h, w, c = x.shape
    ph, rows = _geom(h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, ph * ph, c)
    xp = jnp.pad(xp, ((0, 0), (_LEAD, rows - _LEAD - ph * ph), (0, 0)))
    return xp.reshape(n * rows, c)


def _unpack(y, n: int, h: int):
    """(N * rows, C) -> (N, H, H, C), valid pixels only."""
    ph, rows = _geom(h)
    y = y.reshape(n, rows, -1)[:, _LEAD:_LEAD + ph * ph, :]
    y = y.reshape(n, ph, ph, -1)
    return y[:, 1:h + 1, 1:h + 1, :]


def _conv_block(read, w, bias, ph: int, ld: int):
    """sum of 9 shifted-slice matmuls: ``read(start, ld)`` yields a
    (ld, C) slice whose row 0 is apron row ``start``."""
    acc = jnp.broadcast_to(bias, (ld, w.shape[2]))
    for i, k in enumerate(_shifts(ph)):
        acc = acc + jax.lax.dot(read(_LEAD + k, ld), w[i],
                                preferred_element_type=jnp.float32,
                                precision=_HP)
    return acc


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                m_ref, out_ref, h2_ref, *, ph: int):
    L = x_ref.shape[0]
    ld = L - 2 * _LEAD
    x_read = lambda s, n: x_ref[pl.ds(s, n), :]
    h1 = jnp.maximum(_conv_block(x_read, w1_ref[...], b1_ref[...], ph, ld),
                     0.0)
    h2 = jnp.maximum(
        jax.lax.dot(h1, w2_ref[...], preferred_element_type=jnp.float32,
                    precision=_HP) + b2_ref[...], 0.0)
    # park h2 masked in the padded scratch: conv3's shifted reads must see
    # zeros on ring/apron rows
    h2_ref[...] = jnp.zeros_like(h2_ref)
    h2_ref[pl.ds(_LEAD, ld), :] = h2 * m_ref[pl.ds(_LEAD, ld), :]
    h2_read = lambda s, n: h2_ref[pl.ds(s, n), :]
    out = _conv_block(h2_read, w3_ref[...], b3_ref[...], ph, ld)
    out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[pl.ds(_LEAD, ld), :] = out * m_ref[pl.ds(_LEAD, ld), :]


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                w1t_ref, w3t_ref, m_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                db3_ref, h1_ref, h2_ref, d2_ref, d1_ref, *, ph: int):
    """Recompute h1/h2 in VMEM, then walk the cotangents back.

    Weight/bias grads accumulate across grid cells: their out BlockSpecs
    are constant-index, so the same block is revisited every cell; cell 0
    initializes, later cells add (TPU grid cells run sequentially)."""
    i = pl.program_id(0)
    L = x_ref.shape[0]
    ld = L - 2 * _LEAD
    mask = m_ref[pl.ds(_LEAD, ld), :]
    x_read = lambda s, n: x_ref[pl.ds(s, n), :]

    # ---- recompute forward intermediates (VMEM-resident) ---------------
    a1 = _conv_block(x_read, w1_ref[...], b1_ref[...], ph, ld)
    h1 = jnp.maximum(a1, 0.0)
    a2 = jax.lax.dot(h1, w2_ref[...], preferred_element_type=jnp.float32,
                     precision=_HP) + b2_ref[...]
    h2 = jnp.maximum(a2, 0.0)
    h2_ref[...] = jnp.zeros_like(h2_ref)
    h2_ref[pl.ds(_LEAD, ld), :] = h2 * mask
    # h1 parked padded too: dW1 slices index apron coordinates
    h1_ref[...] = jnp.zeros_like(h1_ref)
    h1_ref[pl.ds(_LEAD, ld), :] = h1 * mask

    # ---- conv3 backward ------------------------------------------------
    g = g_ref[pl.ds(_LEAD, ld), :] * mask  # (ld, cout)
    # dh2[r] = sum_k g[r - k] @ W3[k]^T: park g padded, read with -k
    d2_ref[...] = jnp.zeros_like(d2_ref)
    d2_ref[pl.ds(_LEAD, ld), :] = g
    shifts = _shifts(ph)
    dh2 = jnp.zeros((ld, w2_ref.shape[0]), jnp.float32)
    for i9, k in enumerate(shifts):
        dh2 = dh2 + jax.lax.dot(
            d2_ref[pl.ds(_LEAD - k, ld), :], w3t_ref[i9],
            preferred_element_type=jnp.float32, precision=_HP)
    # dW3[k] = h2_pad[shift k]^T @ g ; contract over rows
    rowdot = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP)
    for i9, k in enumerate(shifts):
        upd = rowdot(h2_ref[pl.ds(_LEAD + k, ld), :], g)
        if i9 == 0:
            db3 = jnp.sum(g, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            dw3_ref[i9] = upd

        @pl.when(i != 0)
        def _():
            dw3_ref[i9] = dw3_ref[i9] + upd

    @pl.when(i == 0)
    def _():
        db3_ref[...] = db3

    @pl.when(i != 0)
    def _():
        db3_ref[...] = db3_ref[...] + db3

    # ---- conv2 (1x1) backward ------------------------------------------
    da2 = dh2 * (a2 > 0) * mask
    dw2_upd = rowdot(h1, da2)
    db2_upd = jnp.sum(da2, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(
        da2, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP)

    @pl.when(i == 0)
    def _():
        dw2_ref[...] = dw2_upd
        db2_ref[...] = db2_upd

    @pl.when(i != 0)
    def _():
        dw2_ref[...] = dw2_ref[...] + dw2_upd
        db2_ref[...] = db2_ref[...] + db2_upd

    # ---- conv1 backward ------------------------------------------------
    da1 = dh1 * (a1 > 0) * mask
    d1_ref[...] = jnp.zeros_like(d1_ref)
    d1_ref[pl.ds(_LEAD, ld), :] = da1
    db1_upd = jnp.sum(da1, axis=0, keepdims=True)
    dx = jnp.zeros((ld, x_ref.shape[1]), jnp.float32)
    for i9, k in enumerate(shifts):
        dx = dx + jax.lax.dot(
            d1_ref[pl.ds(_LEAD - k, ld), :], w1t_ref[i9],
            preferred_element_type=jnp.float32, precision=_HP)
        upd = rowdot(x_ref[pl.ds(_LEAD + k, ld), :], da1)

        @pl.when(i == 0)
        def _():
            dw1_ref[i9] = upd

        @pl.when(i != 0)
        def _():
            dw1_ref[i9] = dw1_ref[i9] + upd

    @pl.when(i == 0)
    def _():
        db1_ref[...] = db1_upd

    @pl.when(i != 0)
    def _():
        db1_ref[...] = db1_ref[...] + db1_upd

    dx_ref[...] = jnp.zeros_like(dx_ref)
    # the x apron/ring rows are zeros by construction; their cotangent is
    # never read back (unpack drops them), so masking dx to valid rows
    # loses nothing and keeps the pad rows clean
    dx_ref[pl.ds(_LEAD, ld), :] = dx * mask


def _pick_tile(n_images: int, cap: int) -> int:
    """Images per grid cell, bounded by the 16 MB scoped-VMEM budget:
    every (L, C) buffer lane-pads to 128, so live bytes ~= n_live * L *
    512; the backward keeps ~3x the forward's live set."""
    for t in (cap, cap // 2, 1):
        if t >= 1 and n_images % t == 0:
            return t
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_conv_bottleneck(x, k1, b1, k2, b2, k3, b3, interpret=None):
    """relu-free 3x3 -> relu -> 1x1 -> relu -> 3x3 SAME bottleneck,
    fused. x: (N, H, H, C_in) f32; k1 (3,3,C_in,F), k2 (1,1,F,F),
    k3 (3,3,F,C_out) HWIO; biases 1-D. Exact-f32 matmuls (HIGHEST).
    Returns (N, H, H, C_out) f32 — same math as the XLA composition
    conv(relu(conv(relu(conv(x)))))."""
    return _fwd(x, k1, b1, k2, b2, k3, b3, interpret)[0]


def _common(x, interpret, cap):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h = x.shape[0], x.shape[1]
    ph, rows = _geom(h)
    tile = _pick_tile(n, cap)
    return interpret, n, h, ph, rows, tile, n // tile


def _fwd(x, k1, b1, k2, b2, k3, b3, interpret):
    interpret, n, h, ph, rows, tile, ncell = _common(x, interpret, cap=2)
    L = tile * rows
    cin, f = k1.shape[2], k1.shape[3]
    cout = k3.shape[3]
    xr = _pack(x.astype(jnp.float32))
    mask = jnp.asarray(_row_mask(h, tile))  # one cell's worth
    w1 = k1.astype(jnp.float32).reshape(9, cin, f)
    w3 = k3.astype(jnp.float32).reshape(9, f, cout)
    w2 = k2.astype(jnp.float32).reshape(f, f)
    args = (xr, w1, b1.astype(jnp.float32)[None, :], w2,
            b2.astype(jnp.float32)[None, :], w3,
            b3.astype(jnp.float32)[None, :], mask)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ph=ph),
        grid=(ncell,),
        in_specs=[
            pl.BlockSpec((L, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, f), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, f, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * rows, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L, f), jnp.float32)],
        interpret=interpret,
    )(*args)
    return _unpack(out, n, h), (x, k1, b1, k2, b2, k3, b3)


def _bwd(interpret, res, g):
    x, k1, b1, k2, b2, k3, b3 = res
    interpret, n, h, ph, rows, tile, ncell = _common(x, interpret, cap=2)
    L = tile * rows
    cin, f = k1.shape[2], k1.shape[3]
    cout = k3.shape[3]
    xr = _pack(x.astype(jnp.float32))
    gr = _pack(g.astype(jnp.float32))
    mask = jnp.asarray(_row_mask(h, tile))
    w1 = k1.astype(jnp.float32).reshape(9, cin, f)
    w3 = k3.astype(jnp.float32).reshape(9, f, cout)
    w2 = k2.astype(jnp.float32).reshape(f, f)
    # transposed per-tap weights for the input-cotangent convolutions
    w1t = jnp.swapaxes(w1, 1, 2)  # (9, F, C_in)
    w3t = jnp.swapaxes(w3, 1, 2)  # (9, C_out, F)
    cw = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, ph=ph),
        grid=(ncell,),
        in_specs=[
            pl.BlockSpec((L, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            cw(9, cin, f), cw(1, f), cw(f, f), cw(1, f), cw(9, f, cout),
            cw(9, f, cin), cw(9, cout, f),
            pl.BlockSpec((L, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            cw(9, cin, f), cw(1, f), cw(f, f), cw(1, f),
            cw(9, f, cout), cw(1, cout),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * rows, cin), jnp.float32),
            jax.ShapeDtypeStruct((9, cin, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((9, f, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((L, f), jnp.float32),
                        pltpu.VMEM((L, f), jnp.float32),
                        pltpu.VMEM((L, cout), jnp.float32),
                        pltpu.VMEM((L, f), jnp.float32)],
        interpret=interpret,
    )(xr, gr, w1, b1.astype(jnp.float32)[None, :], w2,
      b2.astype(jnp.float32)[None, :], w3, w1t, w3t, mask)
    dxr, dw1, db1, dw2, db2, dw3, db3 = outs
    return (_unpack(dxr, n, h).astype(x.dtype),
            dw1.reshape(k1.shape).astype(k1.dtype),
            db1[0].astype(b1.dtype),
            dw2.reshape(k2.shape).astype(k2.dtype),
            db2[0].astype(b2.dtype),
            dw3.reshape(k3.shape).astype(k3.dtype),
            db3[0].astype(b3.dtype))


fused_conv_bottleneck.defvjp(_fwd, _bwd)
