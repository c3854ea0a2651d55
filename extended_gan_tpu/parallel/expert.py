"""Expert parallelism (EP): the MoE expert axis sharded over the mesh.

The fifth parallelism axis next to DP/TP/SP (:mod:`.mesh`) and PP
(:mod:`.pipeline`). The reference has no distributed execution at all
(SURVEY.md section 2.7); this module implements the GShard/Switch TPU
recipe for :class:`~extended_gan_tpu.models.moe.SwitchMoE`:

- every device holds only ``E / D`` experts' weights (and therefore only
  that slice of their Adam moments) — the EP memory story mirrors TP's,
- tokens live data-parallel (each device routes its own batch shard),
- the token<->expert exchange is two ``lax.all_to_all`` collectives inside
  one ``shard_map``-ped program: dispatch slots leave sharded-by-expert,
  come back sharded-by-source — on hardware these ride ICI as the single
  balanced exchange pattern the topology is built for,
- routing math and the expert FFN are the *same pure functions* the
  single-device dense path runs (``models/moe.py``), so EP == dense
  numerics whenever capacity is not exceeded (tests/test_moe.py).

EP rides the ``data`` mesh axis (the standard TPU MoE layout: the expert
group IS the data-parallel group, so no extra mesh axis is spent and the
all_to_all spans exactly the devices that hold the tokens).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.moe import expert_ffn, route_top1
from .mesh import MeshContext


def moe_param_spec(params: dict, n_experts: int, axis: str = "data"):
    """PartitionSpec pytree for a SwitchMoE param dict: expert-axis leaves
    sharded on ``axis``, the router replicated."""
    return {
        k: P(axis) if (getattr(v, "ndim", 0) >= 1
                       and v.shape[0] == n_experts and k != "router")
        else P()
        for k, v in params.items()
    }


def shard_moe_params_ep(params: dict, mesh: MeshContext, n_experts: int,
                        axis: str = "data"):
    """Place a SwitchMoE param dict (``router, w1, b1, w2, b2``) so each
    device along ``axis`` holds only its ``E/D`` experts."""
    spec = moe_param_spec(params, n_experts, axis)
    return {
        k: jax.device_put(v, NamedSharding(mesh.mesh, spec[k]))
        for k, v in params.items()
    }


def shard_tree_moe_ep(tree: Any, mesh: MeshContext, n_experts: int,
                      axis: str = "data"):
    """EP-shard the SwitchMoE leaves inside a FULL model pytree (params or
    the mirrored Adam moments): any leaf under a ``moe`` module scope with
    a leading expert axis (dim 0 == n_experts, router excluded) goes
    ``P(axis)``; everything else keeps its current placement.

    This is the driver-side EP placement: each device along ``axis`` holds
    ``E/D`` experts' weights + moments while jit/GSPMD partitions the
    dispatch einsums accordingly. The explicit all_to_all program
    (:func:`make_moe_ep_apply`) is the collective-pinned equivalent used
    by the tests and the multi-chip dryrun."""
    d = mesh.mesh.shape[axis]
    if d == 1 or n_experts % d:
        return tree
    sharding = NamedSharding(mesh.mesh, P(axis))

    def place(path, leaf):
        in_moe = any(getattr(p, "key", None) == "moe" for p in path)
        is_router = any(getattr(p, "key", None) == "router" for p in path)
        if (in_moe and not is_router and getattr(leaf, "ndim", 0) >= 1
                and leaf.shape[0] == n_experts):
            return jax.device_put(leaf, sharding)
        return leaf

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(
        treedef, [place(p, l) for p, l in flat])


def make_moe_ep_apply(mesh: MeshContext, *, n_experts: int, capacity: int,
                      axis: str = "data", dtype: Any = jnp.float32):
    """Build the expert-parallel MoE forward.

    Returns ``apply(params, tokens) -> (out, aux)`` where ``tokens`` is
    (N, C) sharded on ``axis`` (N % D == 0), ``params`` is a SwitchMoE
    param dict sharded by :func:`shard_moe_params_ep`, and ``capacity`` is
    the per-expert slot count **per device shard** (static).

    Inside the program, per device shard:

    1. route the local ``N/D`` tokens (router weights are replicated),
    2. build local dispatch slots ``(E, cap, C)``,
    3. ``all_to_all`` → ``(E/D, D*cap, C)``: this device now holds every
       shard's slots for its local experts,
    4. run the local experts' FFN (one batched einsum pair),
    5. ``all_to_all`` back → ``(E, cap, C)`` locally-routed results,
    6. combine with the local gate weights.

    The aux load-balance loss is the mean over shards (each shard's aux is
    computed on its local token statistics).
    """
    d = mesh.mesh.shape[axis]
    if n_experts % d:
        raise ValueError(
            f"n_experts {n_experts} not divisible by {axis}-axis size {d}"
        )

    param_specs = {
        "router": P(), "w1": P(axis), "b1": P(axis),
        "w2": P(axis), "b2": P(axis),
    }

    @functools.partial(
        jax.shard_map,
        mesh=mesh.mesh,
        in_specs=(param_specs, P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def apply(params, tokens):
        dispatch, combine, aux = route_top1(
            tokens, params["router"], capacity)
        expert_inputs = jnp.einsum(
            "nec,nd->ecd", dispatch.astype(dtype), tokens.astype(dtype))
        # (E, cap, C) -> (E/D, D*cap, C): slots travel to their expert's
        # device; the receive side concatenates the D source shards' slots
        expert_inputs = jax.lax.all_to_all(
            expert_inputs, axis, split_axis=0, concat_axis=1, tiled=True)
        expert_outputs = expert_ffn(
            params["w1"], params["b1"], params["w2"], params["b2"],
            expert_inputs, dtype=dtype)
        # (E/D, D*cap, C) -> (E, cap, C): results return to token owners
        expert_outputs = jax.lax.all_to_all(
            expert_outputs, axis, split_axis=1, concat_axis=0, tiled=True)
        out = jnp.einsum(
            "nec,ecd->nd", combine.astype(dtype), expert_outputs)
        return out, jax.lax.pmean(aux, axis)

    return apply
