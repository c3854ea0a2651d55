"""Thin model wrappers stacking GATMultiHead3D blocks.

Parity with /root/reference/convolutional_gat/model.py:8-248 (the forwards
as actually executed — several reference wrappers construct an output layer
their forward never calls (model.py:44-47, 85-88); we only build what runs,
and fix the ``type=`` typo at model.py:26 that left SpatialModel's hidden
layer with a stale default).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .gat3d import GATMultiHead3D


class _StackedGAT(nn.Module):
    image_width: int
    image_height: int
    n_vertices: int
    time_steps: int = 4
    mapping_type: str = "linear"
    attention_type: str = "temporal"
    heads: tuple = (3,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        for i, nheads in enumerate(self.heads):
            x = GATMultiHead3D(
                nfeat=self.time_steps, nhid=self.time_steps, alpha=0.2,
                nheads=nheads, type_=self.attention_type,
                mapping_type=self.mapping_type,
                image_height=self.image_height,
                image_width=self.image_width,
                n_vertices=self.n_vertices, dtype=self.dtype,
                name="hidden_layer" if i == 0 else "output_layer",
            )(x, train=train)
        return x


def SpatialModel(*, image_width, image_height, n_vertices, time_steps=4,
                 mapping_type="linear", dtype=jnp.float32):
    """model.py:8-47 — one 3-head spatial block."""
    return _StackedGAT(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, time_steps=time_steps,
        mapping_type=mapping_type, attention_type="spatial", heads=(3,),
        dtype=dtype,
    )


def TemporalModel(*, image_width, image_height, n_vertices, time_steps=4,
                  mapping_type="linear", dtype=jnp.float32):
    """model.py:50-88 — one 3-head temporal block."""
    return _StackedGAT(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, time_steps=time_steps,
        mapping_type=mapping_type, attention_type="temporal", heads=(3,),
        dtype=dtype,
    )


def TemporalModel4h(*, image_width, image_height, n_vertices, time_steps=4,
                    mapping_type="linear", dtype=jnp.float32):
    """model.py:91-117 — one 4-head temporal block."""
    return _StackedGAT(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, time_steps=time_steps,
        mapping_type=mapping_type, attention_type="temporal", heads=(4,),
        dtype=dtype,
    )


def TemporalModel2l(*, image_width, image_height, n_vertices, time_steps=4,
                    mapping_type="linear", dtype=jnp.float32):
    """model.py:120-158 — two 3-head temporal blocks."""
    return _StackedGAT(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, time_steps=time_steps,
        mapping_type=mapping_type, attention_type="temporal", heads=(3, 3),
        dtype=dtype,
    )


def MultiStreamModel(*, image_width, image_height, n_vertices, time_steps=4,
                     mapping_type="linear", dtype=jnp.float32):
    """model.py:210-248 — two 1-head multi_stream blocks."""
    return _StackedGAT(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, time_steps=time_steps,
        mapping_type=mapping_type, attention_type="multi_stream",
        heads=(1, 1), dtype=dtype,
    )


class ConvGAT(nn.Module):
    """model.py:161-166 is an empty stub in the reference; kept for API
    parity. Forward raises until a design lands."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        raise NotImplementedError("ConvGAT is a stub in the reference too")
