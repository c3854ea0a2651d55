"""Graph-attention layers (vectorized).

Math parity with /root/reference/convolutional_gat/baseline_model.py, with
the O(V^2)-memory pairwise construction and per-vertex Python loops replaced
by einsums that XLA tiles onto the MXU:

- the reference builds e[b,i,j] by materializing all concat(Wh_i, Wh_j)
  pairs (baseline_model.py:58-65). Since a = [a1; a2], the score decomposes
  as e[b,i,j] = leaky_relu(Wh_i . a1 + Wh_j . a2) — two matvecs + a
  broadcast add, no V^2 x 2E tensor,
- the 2-D variant's per-vertex loop with diag_embed matmuls
  (baseline_model.py:147-152) is the single einsum
  'bjoc,bijc->bioc' (the diag matmul is an elementwise scale),
- the hard-coded ``.cuda()`` (baseline_model.py:43) has no equivalent —
  arrays live wherever the computation is sharded.

The learnable-adjacency normalization (B + I, min-max, D^-1/2 A D^-1/2,
reference :41-50) is kept bit-compatible, including the softmax axes —
notably the 2-D layer's softmax over the *feature* axis (reference :131,
dim=-1 of (B, V, V, C)), a quirk the published numbers were trained with.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_gain_1414 = nn.initializers.variance_scaling(
    1.414**2, mode="fan_avg", distribution="uniform"
)


def adjacency_b_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype) + 1e-6


def normalized_adjacency(B_param: jnp.ndarray) -> jnp.ndarray:
    """(B + I) -> min-max normalize -> D^-1/2 A D^-1/2
    (reference baseline_model.py:44-50)."""
    v = B_param.shape[0]
    adj = B_param + jnp.eye(v, dtype=B_param.dtype)
    adj = (adj - adj.min()) / (adj.max() - adj.min())
    d = jnp.sum(adj, axis=1)
    inv_sqrt = 1.0 / jnp.sqrt(d)
    return adj * inv_sqrt[:, None] * inv_sqrt[None, :]


def pairwise_scores(Wh: jnp.ndarray, a: jnp.ndarray, alpha: float):
    """e[..., i, j] = leaky_relu(Wh_i . a1 + Wh_j . a2) over the second-to-
    last axis of Wh (..., M, E). a: (2E,)."""
    e_dim = Wh.shape[-1]
    a1, a2 = a[:e_dim], a[e_dim:]
    s1 = Wh @ a1  # (..., M)
    s2 = Wh @ a2  # (..., M)
    e = s1[..., :, None] + s2[..., None, :]
    return nn.leaky_relu(e, negative_slope=alpha)


class GraphAttentionLayer(nn.Module):
    """1-D GAT layer over vertices: (N, V, C) or (N, C, T, V) -> (N, V, E).

    Parity with baseline_model.py:13-75.
    """

    in_features: int
    out_features: int
    n_vertices: int
    alpha: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, *, train: bool = True):
        if h.ndim == 4:
            n, c, t, v = h.shape
            h = h.transpose(0, 3, 1, 2).reshape(n, v, c * t)
        W = self.param(
            "W", xavier_gain_1414, (self.in_features, self.out_features)
        )
        a = self.param("a", xavier_gain_1414, (2 * self.out_features, 1))
        B = self.param(
            "B", adjacency_b_init, (self.n_vertices, self.n_vertices)
        )
        h = h.astype(self.dtype)
        Wh = h @ W.astype(self.dtype)  # (N, V, E)
        e = pairwise_scores(
            Wh.astype(jnp.float32), a[:, 0], self.alpha
        )  # (N, V, V)
        attention = nn.softmax(e, axis=-1)
        adj_norm = normalized_adjacency(B)  # (V, V)
        # full-f32 contractions (XLA default = bf16 MXU passes; the small
        # V-sized dims make HIGHEST free and keep torch-exact numerics)
        hp = jax.lax.Precision.HIGHEST
        attention = jnp.einsum("uv,nvw->nuw", adj_norm, attention,
                               precision=hp)
        h_prime = jnp.einsum(
            "nuv,nve->nue", attention, Wh.astype(jnp.float32), precision=hp
        )
        return nn.elu(h_prime)


class GATMultiHead(nn.Module):
    """Concatenate nheads GraphAttentionLayer outputs on the feature axis
    (baseline_model.py:78-102)."""

    nfeat: int
    nhid: int
    n_vertices: int
    alpha: float = 0.2
    nheads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        outs = [
            GraphAttentionLayer(
                in_features=self.nfeat,
                out_features=self.nhid,
                n_vertices=self.n_vertices,
                alpha=self.alpha,
                dtype=self.dtype,
                name=f"attention_{i}",
            )(x, train=train)
            for i in range(self.nheads)
        ]
        return jnp.concatenate(outs, axis=-1)


class GraphAttentionLayer2D(nn.Module):
    """2-D GAT layer keeping (C, T) separate: (N, C, T, V) -> (N, C, E, V).

    Parity with baseline_model.py:105-179 — including the softmax over the
    feature axis (:131) and the post-mix adjacency matmul (:155-158) — but
    the V-loop becomes one einsum.
    """

    in_features: int
    out_features: int
    n_vertices: int
    alpha: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, *, train: bool = True):
        n, c, t, v = h.shape
        h = h.transpose(0, 3, 1, 2)  # (N, V, C, T)
        W = self.param(
            "W", xavier_gain_1414, (self.in_features, self.out_features)
        )
        a = self.param("a", xavier_gain_1414, (2 * self.out_features, 1))
        B = self.param(
            "B", adjacency_b_init, (self.n_vertices, self.n_vertices)
        )
        Wh = (h.astype(self.dtype) @ W.astype(self.dtype)).astype(
            jnp.float32
        )  # (N, V, C, E)
        e_dim = self.out_features
        a1, a2 = a[:e_dim, 0], a[e_dim:, 0]
        s1 = Wh @ a1  # (N, V, C)
        s2 = Wh @ a2
        e = nn.leaky_relu(
            s1[:, :, None, :] + s2[:, None, :, :], negative_slope=self.alpha
        )  # (N, V, V, C)
        attention = nn.softmax(e, axis=-1)  # over C — reference :131
        # per-vertex mix: h2[n,i,o,c] = sum_j Wh[n,j,o,c] * att[n,i,j,c]
        hp = jax.lax.Precision.HIGHEST
        Wh_oc = Wh.transpose(0, 1, 3, 2)  # (N, V, E, C)
        h2 = jnp.einsum("njoc,nijc->nioc", Wh_oc, attention, precision=hp)
        adj_norm = normalized_adjacency(B)  # (V, V)
        # reference :155-158: reshape to (N, C*E, V) then @ adj_norm
        h3 = jnp.einsum("nioc,iv->ncov", h2, adj_norm, precision=hp)
        return nn.elu(h3)  # (N, C, E, V)


class GATMultiHead2D(nn.Module):
    """Concatenate heads along the feature (T') axis
    (baseline_model.py:182-197)."""

    nfeat: int
    nhid: int
    n_vertices: int
    alpha: float = 0.2
    nheads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        outs = [
            GraphAttentionLayer2D(
                in_features=self.nfeat,
                out_features=self.nhid,
                n_vertices=self.n_vertices,
                alpha=self.alpha,
                dtype=self.dtype,
                name=f"attention_{i}",
            )(x, train=train)
            for i in range(self.nheads)
        ]
        return jnp.concatenate(outs, axis=2)
