"""Pipeline parallelism (PP): GPipe-style microbatched stage pipeline.

The reference is single-device (SURVEY.md §2.7), so it has no counterpart;
this is the TPU-native fourth parallelism axis next to DP/TP/SP in
:mod:`.mesh`. Where TP shards *within* a layer's math and SP stripes the
*spatial* axis, PP places whole **stages** (consecutive layers) on
successive devices along the ``model`` mesh axis and streams microbatches
through them:

- each device holds ONLY its stage's parameters (and therefore only its
  stage's optimizer moments) — the per-device parameter memory is
  ``1/S`` of the model, the PP memory story,
- activations hop stage-to-stage with ``lax.ppermute`` — on hardware,
  point-to-point ICI neighbor transfers, the cheapest collective there is,
- the schedule is expressed as a ``lax.scan`` over ``M + S - 1`` ticks
  inside one ``shard_map``-ped XLA program: tick ``t`` has stage ``s``
  working on microbatch ``t - s`` (the classic GPipe diagonal), with the
  leading/trailing bubbles costing ``(S-1)/(M+S-1)`` of the ticks,
- the backward pass needs no second schedule: ``jax.grad`` through the
  scan replays it in reverse and the transpose of ``ppermute`` is the
  inverted permutation, so autodiff *derives* the backward pipeline.

Stages must share one activation signature (shape in == shape out) — true
of the reference's stacked GAT blocks (``BaselineModel``'s two
``GATMultiHead`` layers both map ``(B, V, F) -> (B, V, F)``,
/root/reference/convolutional_gat/baseline_model.py:200-270), which makes
the reference's own flagship graph-attention model pipeline-able without
reshaping adapters.

Composes with DP: the mesh is ``(data, model)``; microbatches shard their
batch axis over ``data`` while stages ride ``model``, giving DP x PP in a
single program (XLA adds the gradient all-reduce over ``data``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MeshContext


# ------------------------------------------------------------- param utils

def stack_stage_params(stage_params: Sequence[Any]):
    """Stack S per-stage parameter pytrees (identical treedef) into one
    pytree with a leading stage axis — the axis PP shards over."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *stage_params
    )


def unstack_stage_params(stacked: Any, s: int):
    """Inverse of :func:`stack_stage_params` for one stage index."""
    return jax.tree_util.tree_map(lambda a: a[s], stacked)


def shard_stage_params(stacked: Any, mesh: MeshContext):
    """Place stacked stage params so device ``s`` of the ``model`` axis
    holds (only) stage ``s``: leading axis sharded over ``model``,
    replicated over ``data`` (and ``dcn`` if present)."""
    sharding = NamedSharding(mesh.mesh, P("model"))
    return jax.device_put(stacked, sharding)


# ---------------------------------------------------------------- schedule

def make_pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    mesh: MeshContext,
):
    """Build the pipelined forward for ``S = mesh model-axis size`` stages.

    ``stage_fn(params_s, x) -> y`` applies ONE stage; ``y.shape ==
    x.shape``. The returned function maps ``(stacked_params, xs)`` with
    ``xs`` of shape ``(M, mb, ...)`` (M microbatches) to ``(M, mb, ...)``
    outputs, microbatch ``i`` having traversed stages ``0..S-1`` in order.

    The result is differentiable in ``stacked_params`` (grads inherit the
    stage sharding) and in ``xs``.
    """
    S = mesh.mesh.shape["model"]
    axes = mesh.mesh.axis_names
    data = ("dcn", "data") if "dcn" in axes else "data"

    @functools.partial(
        jax.shard_map,
        mesh=mesh.mesh,
        in_specs=(P("model"), P(None, data)),
        out_specs=P(None, data),
        check_vma=False,
    )
    def run(stacked_params, xs):
        # locally the stage axis has length 1: this device's stage
        p = jax.tree_util.tree_map(lambda a: a[0], stacked_params)
        s = jax.lax.axis_index("model")
        M = xs.shape[0]

        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(state, t):
            # stage 0 injects microbatch t (clamped; out-of-range ticks
            # compute on garbage that never reaches the output window)
            inj = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
            )
            cur = jnp.where(s == 0, inj, state)
            y = stage_fn(p, cur)
            nxt = jax.lax.ppermute(y, "model", perm)
            return nxt, y

        init = jnp.zeros_like(xs[0])
        _, ys = jax.lax.scan(tick, init, jnp.arange(M + S - 1))

        # stage S-1 emits microbatch i at tick i + S - 1
        out = jax.lax.dynamic_slice_in_dim(ys, S - 1, M, axis=0)
        out = jnp.where(s == S - 1, out, jnp.zeros_like(out))
        # broadcast the last stage's result to every stage rank
        return jax.lax.psum(out, "model")

    return run


def microbatch(x: jax.Array, n_microbatches: int) -> jax.Array:
    """(B, ...) -> (M, B/M, ...). B must divide evenly (static shapes)."""
    b = x.shape[0]
    if b % n_microbatches:
        raise ValueError(
            f"batch {b} not divisible by n_microbatches {n_microbatches}"
        )
    return x.reshape((n_microbatches, b // n_microbatches) + x.shape[1:])


def unmicrobatch(xs: jax.Array) -> jax.Array:
    return xs.reshape((-1,) + xs.shape[2:])


def put_microbatched(mesh: MeshContext, *arrays):
    """Host->device placement for (M, mb, ...) inputs: microbatch-queue
    axis replicated, per-microbatch batch axis sharded over DP."""
    dp = ("dcn", "data") if "dcn" in mesh.mesh.axis_names else "data"
    sharding = mesh.sharding(None, dp)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


# ----------------------------------------------- reference-model pipelines

def split_baseline_gat_stages(params: Any) -> list:
    """BaselineModel params -> per-stage pytrees.

    The reference BaselineModel (baseline_model.py:200-270) is exactly two
    identically-shaped GAT blocks (``hidden_layer``, ``output_layer``) —
    a natural 2-stage pipeline. Deeper stacks built from the same block
    (any flax params dict whose top-level keys are the stage layers, in
    order) split the same way.
    """
    names = list(params.keys())
    return [{"gat": params[n]} for n in names]


def make_baseline_gat_pipeline(model, mesh: MeshContext):
    """Pipeline the reference BaselineModel across the ``model`` axis.

    ``model`` is a :class:`~extended_gan_tpu.models.gat.BaselineModel`
    (or a deeper stack with the same per-layer signature) whose layers all
    map ``(B, V, F) -> (B, V, F)``. Returns ``(apply, prepare)`` where
    ``prepare(params)`` stacks + shards the per-layer params and
    ``apply(stacked, x_bhwtv, n_microbatches)`` reproduces
    ``model.apply`` (forward only; the GAT blocks are deterministic).
    """
    from ..models.gat.layers import GATMultiHead

    n_features = model.time_steps * model.image_height * model.image_width
    block = GATMultiHead(
        nfeat=n_features, nhid=n_features, n_vertices=model.n_vertices,
        alpha=0.2, nheads=1, dtype=model.dtype,
    )

    def stage_fn(p, x):
        return block.apply({"params": p["gat"]}, x, train=False)

    pipe = make_pipeline_apply(stage_fn, mesh)

    def prepare(params: Any):
        stages = split_baseline_gat_stages(params)
        S = mesh.mesh.shape["model"]
        if len(stages) != S:
            raise ValueError(
                f"model has {len(stages)} stages but the model axis is "
                f"{S}-wide; they must match for PP"
            )
        return shard_stage_params(stack_stage_params(stages), mesh)

    def apply(stacked, x, n_microbatches: int):
        b, h, w, t, v = x.shape
        xs = x.reshape(b, h * w * t, v).transpose(0, 2, 1)  # (B, V, F)
        xs = microbatch(xs, n_microbatches)
        ys = pipe(stacked, xs)
        y = unmicrobatch(ys)
        return jnp.tanh(y.reshape(b, h, w, t, v))

    return apply, prepare
