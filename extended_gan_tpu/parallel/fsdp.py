"""FSDP / ZeRO-3: parameter + optimizer-state sharding over ``data``.

The reference replicates nothing because it has nothing to replicate — it
is single-device with three full Adam optimizers resident next to the
params (dcgan/train.py:227-236; SURVEY.md §2.7: zero ``torch.distributed``
usage). Our DP layer replicates params + moments on every chip; FSDP
removes that replication the TPU way:

- every large parameter leaf (and its Adam moments, which mirror the param
  shapes) is sharded over the ``data`` mesh axis via a ``NamedSharding``
  annotation — no hand-written collectives;
- XLA's SPMD partitioner derives the ZeRO-3 schedule from the annotations
  alone: all-gather of each shard right before its use in forward/backward,
  reduce-scatter of its gradient back to the shard, and a fully local
  optimizer update (tested in tests/test_fsdp.py via compiled-HLO
  collective counts and per-device shard bytes);
- tiny leaves (biases, BN scales/stats) stay replicated — gathering a
  16-float bias costs more than holding 8 copies of it. ``min_size``
  is the element-count threshold.

Composition: FSDP spends the ``data`` axis on *weights* while DP spends it
on the *batch* — both at once is exactly ZeRO. TP ("model"-axis kernels)
composes too: :func:`_fsdp_spec` preserves already-sharded axes and picks a
different one for ``data`` (a (4,4,256,512) kernel under TP2xFSDP4 ends up
(None, None, "data"-on-Cin, "model"-on-Cout)). Leaves already sharded over
``data`` (e.g. expert-parallel MoE stacks, parallel/expert.py) are left
alone. On hybrid ``(dcn, data, model)`` meshes the shards stay on the
intra-slice ``data`` axis only, so the per-step all-gathers ride ICI and
each slice keeps a full replica — DCN carries only the gradient psum.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MeshContext

#: Leaves with fewer elements than this stay replicated (16 KiB of f32).
DEFAULT_MIN_SIZE = 4096


def _axis_names(entry) -> tuple:
    """Mesh axis names referenced by one PartitionSpec entry."""
    if entry is None:
        return ()
    return (entry,) if isinstance(entry, str) else tuple(entry)


def _fsdp_spec(leaf, dp: int, min_size: int):
    """The PartitionSpec that adds a ``data``-sharded axis to ``leaf``.

    Returns None when the leaf should be left as-is: scalars, leaves under
    ``min_size`` elements, leaves with no axis divisible by ``dp``, and
    leaves that already shard over ``data`` (EP expert stacks). Existing
    sharded axes (TP's ``model``) are preserved; the largest remaining
    divisible axis gets ``data``.
    """
    if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.size < min_size:
        return None
    spec = [None] * leaf.ndim
    sh = getattr(leaf, "sharding", None)
    if isinstance(sh, NamedSharding):
        existing = list(sh.spec)
        spec[: len(existing)] = existing
        if any("data" in _axis_names(e) for e in spec):
            return None
    best = None
    for i, d in enumerate(leaf.shape):
        if spec[i] is not None or d == 0 or d % dp:
            continue
        if best is None or d > leaf.shape[best]:
            best = i
    if best is None:
        return None
    spec[best] = "data"
    return P(*spec)


def shard_params_fsdp(
    params, mesh_ctx: MeshContext, min_size: int = DEFAULT_MIN_SIZE
):
    """Shard every large leaf of a param/moment tree over ``data``."""
    dp = mesh_ctx.n_data
    if dp == 1:
        return params

    def put(leaf):
        spec = _fsdp_spec(leaf, dp, min_size)
        if spec is None:
            return leaf
        return jax.device_put(leaf, mesh_ctx.sharding(*spec))

    return jax.tree_util.tree_map(put, params)


def shard_net_state_fsdp(
    state, mesh_ctx: MeshContext, min_size: int = DEFAULT_MIN_SIZE
):
    """ZeRO-shard a NetState: params AND their Adam moments.

    Sharding only the params would leave 2/3 of the optimizer-resident
    bytes (mu/nu) replicated; with both sharded the update stays fully
    local to each shard. ``batch_stats`` (tiny per-channel vectors) fall
    under ``min_size`` and stay replicated by design — BN statistics are
    read by every device every step.
    """
    return state.replace(
        params=shard_params_fsdp(state.params, mesh_ctx, min_size),
        opt_state=shard_params_fsdp(state.opt_state, mesh_ctx, min_size),
    )
