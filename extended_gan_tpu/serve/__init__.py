"""Production serving: AOT export of trained forwards to StableHLO."""

from .export import (
    FORMAT_VERSION,
    export_forward,
    load_exported,
    save_exported,
    serving_fn,
)
from .server import ModelServer, make_server, serve_forever

__all__ = [
    "FORMAT_VERSION",
    "ModelServer",
    "export_forward",
    "load_exported",
    "make_server",
    "save_exported",
    "serve_forever",
    "serving_fn",
]
