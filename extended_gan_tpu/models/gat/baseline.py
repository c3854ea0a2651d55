"""Baseline GAT frame predictors.

Parity with /root/reference/convolutional_gat/baseline_model.py:200-270:

- :class:`BaselineModel` — flatten H*W*T per vertex, two 1-head GAT layers,
  tanh. NOTE the reference reshapes the (N, V, F) output straight to
  (B, H, W, T, V) (baseline_model.py:269 ``view``), which interleaves the
  vertex axis through the spatial/temporal axes; the trained numbers depend
  on it, so we reproduce the same row-major reshape.
- :class:`BaselineModel2D` — flatten H*W only, two 1-head 2-D GAT layers.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import GATMultiHead, GATMultiHead2D


class BaselineModel(nn.Module):
    image_width: int
    image_height: int
    n_vertices: int
    time_steps: int = 4
    mapping_type: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        b, h, w, t, v = x.shape
        n_features = self.time_steps * self.image_height * self.image_width
        x = x.reshape(b, h * w * t, v).transpose(0, 2, 1)  # (B, V, F)
        x = GATMultiHead(
            nfeat=n_features, nhid=n_features, n_vertices=self.n_vertices,
            alpha=0.2, nheads=1, dtype=self.dtype, name="hidden_layer",
        )(x, train=train)
        x = GATMultiHead(
            nfeat=n_features, nhid=n_features, n_vertices=self.n_vertices,
            alpha=0.2, nheads=1, dtype=self.dtype, name="output_layer",
        )(x, train=train)
        # reference's raw view (B, V, F) -> (B, H, W, T, V): row-major
        return jnp.tanh(x.reshape(b, h, w, t, v))


class BaselineModel2D(nn.Module):
    image_width: int
    image_height: int
    n_vertices: int
    time_steps: int = 4
    mapping_type: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        b, h, w, t, v = x.shape
        x = x.reshape(b, h * w, t, v)  # (N, C=H*W, T, V)
        x = GATMultiHead2D(
            nfeat=self.time_steps, nhid=self.time_steps,
            n_vertices=self.n_vertices, alpha=0.2, nheads=1,
            dtype=self.dtype, name="hidden_layer",
        )(x, train=train)
        x = GATMultiHead2D(
            nfeat=self.time_steps, nhid=self.time_steps,
            n_vertices=self.n_vertices, alpha=0.2, nheads=1,
            dtype=self.dtype, name="output_layer",
        )(x, train=train)
        return jnp.tanh(x.reshape(b, h, w, t, v))
