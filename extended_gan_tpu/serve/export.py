"""AOT model export for production serving.

The reference has no deployment story beyond pickled ``state_dict``s
reloaded into live Python modules
(``/root/reference/convolutional_gat/compare_models/__main__.py:122-125``,
``/root/reference/convolutional_gat/create_plots.py:54-61``) — serving a
model requires the full training codebase plus a Python interpreter.

The TPU-native equivalent is ``jax.export``: the jitted forward pass (with
the trained weights baked in as constants) is lowered ONCE to StableHLO,
serialized into a single self-contained artifact, and later deserialized
and executed without the model's Python source — on any runtime whose
platform matches the export (``tpu`` and/or ``cpu``), including non-Python
StableHLO runtimes (IFRT / PJRT C API consumers).

The batch axis is exported *symbolically* (shape polymorphism), so one
artifact serves every batch size without retracing or recompiling Python.

Artifact layout: ``<path>`` holds the serialized Exported bytes;
``<path>.json`` is a human-readable sidecar with the i/o contract and the
platforms the artifact runs on.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Sequence

import jax
from jax import export as jexport

FORMAT_VERSION = 1


def export_forward(
    apply_fn: Callable[[Any], Any],
    example_x,
    *,
    batch_polymorphic: bool = True,
    platforms: Sequence[str] | None = None,
) -> "jexport.Exported":
    """Lower ``apply_fn(x)`` ahead-of-time to a portable Exported.

    ``apply_fn`` must close over its weights (so they are baked into the
    artifact as constants) and take a single batched array ``x``. With
    ``batch_polymorphic`` the leading axis is exported as the symbolic
    dimension ``b``; all other axes are pinned to ``example_x``'s shape.

    ``platforms`` pins the target runtimes (e.g. ``("tpu", "cpu")``);
    default is the current default backend only.
    """
    if batch_polymorphic:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct(
            (b, *example_x.shape[1:]), example_x.dtype
        )
    else:
        spec = jax.ShapeDtypeStruct(example_x.shape, example_x.dtype)
    jitted = jax.jit(apply_fn)
    if platforms is not None:
        return jexport.export(jitted, platforms=tuple(platforms))(spec)
    return jexport.export(jitted)(spec)


def save_exported(
    exported: "jexport.Exported", path: str, metadata: dict | None = None
) -> dict:
    """Serialize ``exported`` to ``path`` (+ a ``.json`` sidecar)."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "format_version": FORMAT_VERSION,
        "platforms": list(exported.platforms),
        "inputs": [str(a) for a in exported.in_avals],
        "outputs": [str(a) for a in exported.out_avals],
        "nbytes": len(blob),
    }
    meta.update(metadata or {})
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_exported(path: str) -> "jexport.Exported":
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def serving_fn(path: str) -> Callable[[Any], Any]:
    """Load an artifact and return a jitted ``fn(x) -> y``.

    The returned callable executes the embedded StableHLO; the model's
    Python class is NOT needed (and is not imported).
    """
    exported = load_exported(path)
    return jax.jit(exported.call)
