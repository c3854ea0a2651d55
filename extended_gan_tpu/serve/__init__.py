"""Production serving: AOT export of trained forwards to StableHLO."""

from .export import (
    FORMAT_VERSION,
    export_forward,
    load_exported,
    save_exported,
    serving_fn,
)
from .quantize import (
    fold_generator_bn,
    folded_apply,
    make_quantized_generator,
    make_w8_apply,
)
from .rollout import make_rollout
from .server import ModelServer, make_server, serve_forever

__all__ = [
    "FORMAT_VERSION",
    "ModelServer",
    "export_forward",
    "fold_generator_bn",
    "folded_apply",
    "load_exported",
    "make_quantized_generator",
    "make_rollout",
    "make_w8_apply",
    "make_server",
    "save_exported",
    "serve_forever",
    "serving_fn",
]
