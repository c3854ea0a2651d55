"""Fused GAT attention — one Pallas kernel per batch element.

The math is GAT3DHead._attend (models/gat/gat3d.py), i.e. the TPU-native
form of the reference's attention block
(/root/reference/convolutional_gat/baseline_model.py:44-65): spatially
pooled descriptors -> additive scores -> leaky_relu -> softmax ->
learnable-adjacency normalization -> descriptor mixing -> ELU. XLA runs it
as ~8 small kernels with HBM round-trips of the mapped tensor between
them; here the whole block computes in VMEM with ONE read and ONE write of
the (T, P) activation per batch element (P = V*HW for the temporal graph,
T*HW for the spatial graph — the kernel is axis-agnostic).

Two layout tricks keep Mosaic happy (no in-kernel transposes):

- the pooled-descriptor scores s[m] = sum_g f[m, g] * a[g] are computed
  WITHOUT materializing f: since f is a mean over group slices of the
  activation row, s == (m @ w) / group_size where w repeats a[g] over each
  group's positions (caller precomputes w),
- the (M, M) additive score matrix e[i, j] = s1[i] + s2[j] is built from
  column vectors with two singleton-contraction dot_generals (outer
  products against ones), never a transpose.

The backward pass is analytic cotangent math over residuals the forward
kernel emits for free (the softmax matrix, the adjacency-mixed attention
and the leaky-relu sign mask are all (M, M) with M = T = 4 — bytes, not
megabytes, next to the (B, M, P) activation). Round-4's backward re-ran
the ENTIRE reference forward inside jax.vjp, which probe_gat_decomp.py
attributed ~0.9 ms of the 2.1 ms training step to; the saved-residual
form does only the three P-sized cotangent contractions plus tiny (M, M)
algebra. Gradients still match jax.grad of the unfused composition
(tested in tests/test_pallas_gat_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _outer_dims():
    # contract the singleton axis 1 of both operands: out[i,j] = a[i,0]*b[j,0]
    return (((1,), (1,)), ((), ()))


def _small_matmul_f32(a, b):
    """(M, K) @ (K, P) as K unrolled VPU broadcast multiply-adds.

    Mosaic lowers MXU dots in bf16 passes even at Precision.HIGHEST on
    this toolchain (~1e-2 absolute error on O(1) values — measured); with
    K = T = 4 the exact-f32 VPU form costs the same bandwidth."""
    k = a.shape[1]
    acc = a[:, 0:1] * b[0:1, :]
    for i in range(1, k):
        acc = acc + a[:, i:i + 1] * b[i:i + 1, :]
    return acc


def _kernel(m_ref, w1_ref, w2_ref, adj_ref, out_ref, att0_ref, att_ref,
            pos_ref, *, alpha: float, inv_group: float):
    m = m_ref[0]  # (M, P) float32
    mm = m.shape[0]
    # scores from implicit pooled descriptors: s = (m @ w) / group_size.
    # w rides as a (1, P) ROW (a (P, 1) column in VMEM pads its lane dim
    # 1 -> 128, a 128x memory blowup); the dot becomes a VPU lane
    # reduction of the elementwise product.
    s1 = jnp.sum(m * w1_ref[:], axis=1, keepdims=True) * inv_group  # (M,1)
    s2 = jnp.sum(m * w2_ref[:], axis=1, keepdims=True) * inv_group
    ones = jnp.ones((mm, 1), jnp.float32)
    # HIGHEST keeps the MXU in full f32 (default bf16 passes cost ~1e-3
    # relative error, visible through exp/softmax)
    e = jax.lax.dot_general(
        s1, ones, dimension_numbers=_outer_dims(),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + jax.lax.dot_general(
        ones, s2, dimension_numbers=_outer_dims(),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    e = jnp.where(e > 0, e, alpha * e)  # leaky_relu
    # sign BEFORE max-subtraction; leaky_relu (alpha > 0) preserves the
    # pre-activation sign, so this is the leaky-relu backward mask
    pos_ref[0] = jnp.where(e > 0, 1.0, 0.0)
    e = e - jnp.max(e, axis=-1, keepdims=True)
    p = jnp.exp(e)
    att0 = p / jnp.sum(p, axis=-1, keepdims=True)  # softmax rows
    att0_ref[0] = att0
    att = _small_matmul_f32(adj_ref[:], att0)
    att_ref[0] = att
    out = _small_matmul_f32(att, m)
    # ELU; Mosaic has no expm1 lowering — exp-1 is within 1 ulp of expm1
    # for the magnitudes reaching this branch (out < 0)
    out_ref[0] = jnp.where(out > 0, out, jnp.exp(out) - 1.0)


def _reference_impl(m, w1, w2, adj_norm, alpha, group_size):
    """Plain-JAX twin of the kernel (same (B, M, P) layout, w as (1, P)
    rows). Used for the custom_vjp backward and as the parity oracle."""
    s1 = jnp.sum(m * w1, axis=-1, keepdims=True) / group_size  # (B, M, 1)
    s2 = jnp.sum(m * w2, axis=-1, keepdims=True) / group_size
    e = s1 + jnp.swapaxes(s2, -1, -2)
    e = jnp.where(e > 0, e, alpha * e)
    att = jax.nn.softmax(e, axis=-1)
    # HIGHEST == exact f32 (matches both the kernel's VPU matmuls and the
    # torch reference; XLA's default TPU matmul is bf16 passes)
    hp = jax.lax.Precision.HIGHEST
    att = jnp.einsum("uv,nvw->nuw", adj_norm, att, precision=hp)
    out = jnp.einsum("nuv,nvp->nup", att, m, precision=hp)
    return jnp.where(out > 0, out, jnp.expm1(out))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_gat_attention(m, w1, w2, adj_norm, alpha, group_size):
    """m: (B, M, P) float32 with P = n_groups * group_size (groups
    contiguous); w1/w2: (1, P) group-repeated attention row vectors;
    adj_norm: (M, M) normalized adjacency. Returns elu(mixed) (B, M, P)."""
    return _pallas_forward(m, w1, w2, adj_norm, alpha, group_size)[0]


def _pallas_forward(m, w1, w2, adj_norm, alpha, group_size,
                    interpret=None):
    """Returns (out, att0, att, pos): the primal plus the (B, M, M)
    residuals the analytic backward needs (softmax rows, adjacency-mixed
    attention, leaky-relu sign mask)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, mm, p = m.shape
    small = pl.BlockSpec((1, mm, mm), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, alpha=float(alpha),
                          inv_group=1.0 / float(group_size)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, mm, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mm, mm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, mm, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            small, small, small,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, mm, p), jnp.float32),
            jax.ShapeDtypeStruct((b, mm, mm), jnp.float32),
            jax.ShapeDtypeStruct((b, mm, mm), jnp.float32),
            jax.ShapeDtypeStruct((b, mm, mm), jnp.float32),
        ],
        interpret=interpret,
    )(m.astype(jnp.float32), w1.astype(jnp.float32),
      w2.astype(jnp.float32), adj_norm.astype(jnp.float32))


def _fwd(m, w1, w2, adj_norm, alpha, group_size):
    out, att0, att, pos = _pallas_forward(m, w1, w2, adj_norm, alpha,
                                          group_size)
    return out, (m, w1, w2, adj_norm, att0, att, pos, out)


def _bwd(alpha, group_size, res, g):
    """Analytic cotangents from saved residuals — no forward recompute.

    Heavy ops (P-sized) are exactly three: the elu/elementwise chain on
    (B, M, P), d_att = d0 @ m^T and d_m = att^T @ d0; everything else is
    (M, M) algebra. HIGHEST precision matches the forward's exact-f32
    contract (gradients are parity-tested against jax.grad of
    _reference_impl)."""
    m, w1, w2, adj_norm, att0, att, pos, out = res
    hp = jax.lax.Precision.HIGHEST
    # elu'(x) = 1 for x > 0 else exp(x) = elu(x) + 1; elu preserves sign
    d0 = g * jnp.where(out > 0, 1.0, out + 1.0)
    # out0 = att @ m
    d_att = jnp.einsum("bip,bjp->bij", d0, m, precision=hp)
    d_m = jnp.einsum("bij,bip->bjp", att, d0, precision=hp)
    # att = adj_norm @ att0
    d_adj = jnp.einsum("bij,bkj->ik", d_att, att0, precision=hp)
    d_att0 = jnp.einsum("ik,bij->bkj", adj_norm, d_att, precision=hp)
    # softmax rows (max-shift is gradient-invariant)
    d_e = att0 * (d_att0 - jnp.sum(d_att0 * att0, axis=-1, keepdims=True))
    d_e = jnp.where(pos > 0, d_e, alpha * d_e)  # leaky_relu'
    inv_group = 1.0 / float(group_size)
    # e_pre[b,i,j] = s1[b,i] + s2[b,j]; s = (m @ w) / group_size
    d_s1 = jnp.sum(d_e, axis=-1, keepdims=True) * inv_group  # (B, M, 1)
    d_s2 = jnp.sum(d_e, axis=-2)[:, :, None] * inv_group     # (B, M, 1)
    d_m = d_m + d_s1 * w1 + d_s2 * w2
    d_w1 = jnp.einsum("bmo,bmp->op", d_s1, m, precision=hp)  # (1, P)
    d_w2 = jnp.einsum("bmo,bmp->op", d_s2, m, precision=hp)
    return d_m, d_w1, d_w2, d_adj


fused_gat_attention.defvjp(_fwd, _bwd)


def attend_temporal_pallas(mapped, a, adj_norm, alpha=0.2):
    """Drop-in for GAT3DHead._attend(mapped, "temporal"): mapped
    (B, H, W, T, V), a (2V,), adj_norm (T, T) already normalized.
    Returns elu(mixed) in the SAME (B, H, W, T, V) layout."""
    b, h, w, t, v = mapped.shape
    hw = h * w
    # (B,H,W,T,V) -> (B, T, V, H*W) -> (B, T, V*HW): groups = vertices
    m = mapped.transpose(0, 3, 4, 1, 2).reshape(b, t, v * hw)
    w1 = jnp.repeat(a[:v], hw).reshape(1, v * hw)
    w2 = jnp.repeat(a[v:], hw).reshape(1, v * hw)
    out = fused_gat_attention(m, w1, w2, adj_norm, alpha, hw)
    return out.reshape(b, t, v, h, w).transpose(0, 3, 4, 1, 2)
