"""Model registry.

Parity with /root/reference/convolutional_gat/utils.py:13-18
(``model_classes``), extended with the baseline GAT models (which the
reference constructs directly in create_plots.py) so every model family is
reachable from experiment configs.

Each factory takes (image_width, image_height, n_vertices, attention_type,
mapping_type [, time_steps, dtype]) and returns a flax module mapping
(B, H, W, T, V) -> (B, H, W, T, V).
"""

from __future__ import annotations

import jax.numpy as jnp

from .gat.baseline import BaselineModel, BaselineModel2D
from .gat.gat3d import Model as GatModel
from .unet_model import UnetModel


def _gat(image_width, image_height, n_vertices, attention_type,
         mapping_type, time_steps=4, dtype=jnp.float32):
    return GatModel(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, attention_type=attention_type,
        mapping_type=mapping_type, time_steps=time_steps, dtype=dtype,
    )


def _unet(image_width, image_height, n_vertices, attention_type,
          mapping_type, time_steps=4, dtype=jnp.float32):
    return UnetModel(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, attention_type=attention_type,
        mapping_type=mapping_type, time_steps=time_steps, dtype=dtype,
    )


def _baseline(image_width, image_height, n_vertices, attention_type,
              mapping_type, time_steps=4, dtype=jnp.float32):
    return BaselineModel(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, time_steps=time_steps,
        mapping_type=mapping_type, dtype=dtype,
    )


def _baseline2d(image_width, image_height, n_vertices, attention_type,
                mapping_type, time_steps=4, dtype=jnp.float32):
    return BaselineModel2D(
        image_width=image_width, image_height=image_height,
        n_vertices=n_vertices, time_steps=time_steps,
        mapping_type=mapping_type, dtype=dtype,
    )


def _wrapper(ctor):
    def make(image_width, image_height, n_vertices, attention_type,
             mapping_type, time_steps=4, dtype=jnp.float32):
        return ctor(
            image_width=image_width, image_height=image_height,
            n_vertices=n_vertices, time_steps=time_steps,
            mapping_type=mapping_type, dtype=dtype,
        )

    return make


def _late_wrappers():
    from .gat.wrappers import (
        MultiStreamModel,
        SpatialModel,
        TemporalModel,
        TemporalModel2l,
        TemporalModel4h,
    )

    return {
        "temporal_1block": _wrapper(TemporalModel),
        "temporal4h": _wrapper(TemporalModel4h),
        "temporal2l": _wrapper(TemporalModel2l),
        "spatial_1block": _wrapper(SpatialModel),
        "multi_stream_2block": _wrapper(MultiStreamModel),
    }


model_classes = {
    "unet": _unet,
    "temporal": _gat,
    "spatial": _gat,
    "multi_stream": _gat,
    "baseline": _baseline,
    "baseline2d": _baseline2d,
    **_late_wrappers(),
}


def build_model(model_type: str, **kwargs):
    if model_type not in model_classes:
        raise KeyError(
            f"unknown model_type {model_type!r}; "
            f"choose from {sorted(model_classes)}"
        )
    return model_classes[model_type](attention_type=model_type, **kwargs)
