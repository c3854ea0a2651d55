"""Model registry.

Parity with /root/reference/convolutional_gat/utils.py:13-18
(``model_classes``), extended with the baseline GAT models (which the
reference constructs directly in create_plots.py) so every model family is
reachable from experiment configs.

Each factory takes (image_width, image_height, n_vertices, attention_type,
mapping_type [, time_steps, dtype, use_pallas]) and returns a flax module
mapping (B, H, W, T, V) -> (B, H, W, T, V). ``use_pallas`` (config key
USE_PALLAS) opts into the fused Pallas kernels on models that have them
(GAT attention in gat3d, DSC in SmaAt-UNet) and is ignored — with a note —
elsewhere.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .gat.baseline import BaselineModel, BaselineModel2D
from .gat.gat3d import Model as GatModel
from .gat.wrappers import (
    MultiStreamModel,
    SpatialModel,
    TemporalModel,
    TemporalModel2l,
    TemporalModel4h,
)
from .unet_model import UnetModel


def _adapter(ctor, *, takes_attention: bool):
    """The one factory shape every registry entry shares: adapt the
    registry's uniform kwargs to what ``ctor``'s dataclass fields accept."""
    try:
        fields = {f.name for f in dataclasses.fields(ctor)}
    except TypeError:  # plain-callable factory (the thin wrappers)
        import inspect

        fields = set(inspect.signature(ctor).parameters)

    def make(image_width, image_height, n_vertices, attention_type,
             mapping_type, time_steps=4, dtype=jnp.float32,
             use_pallas=False, moe_experts=0, conv_impl="nhwc"):
        kwargs = dict(
            image_width=image_width, image_height=image_height,
            n_vertices=n_vertices, time_steps=time_steps,
            mapping_type=mapping_type, dtype=dtype,
        )
        if takes_attention:
            kwargs["attention_type"] = attention_type
        if use_pallas:
            if "use_pallas" not in fields:
                print(f"[registry] {ctor.__name__} has no Pallas path; "
                      f"use_pallas ignored")
            else:
                kwargs["use_pallas"] = True
        if conv_impl != "nhwc":
            if "conv_impl" not in fields:
                print(f"[registry] {ctor.__name__} has no conv_impl "
                      "switch; ignored")
            else:
                kwargs["conv_impl"] = conv_impl
        if moe_experts:
            if "moe_experts" not in fields:
                print(f"[registry] {ctor.__name__} has no MoE bottleneck; "
                      f"moe_experts ignored")
            else:
                kwargs["moe_experts"] = moe_experts
        return ctor(**kwargs)

    return make


model_classes = {
    "unet": _adapter(UnetModel, takes_attention=False),
    "temporal": _adapter(GatModel, takes_attention=True),
    "spatial": _adapter(GatModel, takes_attention=True),
    "multi_stream": _adapter(GatModel, takes_attention=True),
    "baseline": _adapter(BaselineModel, takes_attention=False),
    "baseline2d": _adapter(BaselineModel2D, takes_attention=False),
    "temporal_1block": _adapter(TemporalModel, takes_attention=False),
    "temporal4h": _adapter(TemporalModel4h, takes_attention=False),
    "temporal2l": _adapter(TemporalModel2l, takes_attention=False),
    "spatial_1block": _adapter(SpatialModel, takes_attention=False),
    "multi_stream_2block": _adapter(MultiStreamModel, takes_attention=False),
}


def build_model(model_type: str, **kwargs):
    if model_type not in model_classes:
        raise KeyError(
            f"unknown model_type {model_type!r}; "
            f"choose from {sorted(model_classes)}"
        )
    return model_classes[model_type](attention_type=model_type, **kwargs)
