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


def shard_pp_tree(tree: Any, mesh: MeshContext, n_stages: int):
    """Place a PP state tree: leaves carrying the leading stage axis
    (``shape[0] == n_stages``) shard over ``model``; everything else
    (optimizer step counters, scalars) replicates. Used both at state
    creation and when re-placing a restored checkpoint (resume)."""
    stage = NamedSharding(mesh.mesh, P("model"))
    rep = NamedSharding(mesh.mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, stage if getattr(a, "ndim", 0) >= 1
            and a.shape[0] == n_stages else rep),
        tree,
    )


class BaselineGatPP:
    """Driver-facing PP bundle for the stacked GAT families.

    Wraps :func:`make_baseline_gat_pipeline` with what a TRAINING run
    needs beyond a forward: canonical<->stacked param conversion (so
    ``model.msgpack`` artifacts stay loadable by compare_models /
    create_plots exactly like non-PP runs) and a
    ``forward(params, x) -> y_hat`` closure that plugs into the shared
    train/eval step bodies (gat_trainer ``forward_override``).

    Launch: ``python -m convolutional_gat train --pipeline-stages S``
    (config key PIPELINE_STAGES); S must equal the mesh model-axis size
    and the model's stage count (BaselineModel: 2).
    """

    def __init__(self, model, mesh: MeshContext, n_microbatches: int):
        self.mesh = mesh
        self.n_stages = mesh.mesh.shape["model"]
        self.n_microbatches = int(n_microbatches)
        self._apply, self._prepare = make_baseline_gat_pipeline(model, mesh)
        self._layer_names: list | None = None

    def prepare(self, params: Any):
        """Canonical flax params -> stage-stacked, stage-sharded params."""
        self._layer_names = list(params.keys())
        return self._prepare(params)

    def unprepare(self, stacked: Any) -> dict:
        """Stage-stacked params -> the canonical flax dict (for
        checkpoint/model.msgpack artifacts)."""
        names = self._layer_names or [
            f"layer_{i}" for i in range(self.n_stages)
        ]
        return {
            n: jax.tree_util.tree_map(lambda a: a[i], stacked)["gat"]
            for i, n in enumerate(names)
        }

    def forward(self, params: Any, x: jax.Array) -> jax.Array:
        return self._apply(params, x, self.n_microbatches)

    def place(self, tree: Any):
        return shard_pp_tree(tree, self.mesh, self.n_stages)


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

    dp_axes = ("dcn", "data") if "dcn" in mesh.mesh.axis_names else ("data",)
    dp = 1
    for a in dp_axes:
        dp *= mesh.mesh.shape[a]

    def apply(stacked, x, n_microbatches: int):
        b, h, w, t, v = x.shape
        xs = x.reshape(b, h * w * t, v).transpose(0, 2, 1)  # (B, V, F)
        # pad to the PP quantum (microbatches x DP shards) so eval/viz
        # tails of any size run through the same pipelined program; the
        # forward is elementwise-independent across batch, so zero rows
        # are inert and sliced off below
        pad = (-b) % (n_microbatches * dp)
        if pad:
            xs = jnp.concatenate(
                [xs, jnp.zeros((pad,) + xs.shape[1:], xs.dtype)], axis=0)
        xs = microbatch(xs, n_microbatches)
        ys = pipe(stacked, xs)
        y = unmicrobatch(ys)[:b]
        return jnp.tanh(y.reshape(b, h, w, t, v))

    return apply, prepare
