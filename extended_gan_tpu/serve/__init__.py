"""Production serving: AOT export of trained forwards to StableHLO."""

from .export import (
    FORMAT_VERSION,
    export_forward,
    load_exported,
    save_exported,
    serving_fn,
)

__all__ = [
    "FORMAT_VERSION",
    "export_forward",
    "load_exported",
    "save_exported",
    "serving_fn",
]
