"""Device-mesh runtime.

The reference is single-process / single-device (SURVEY.md section 2.7: zero
``torch.distributed`` usage). This module is the parallelism layer the
reference never had, built the TPU way:

- a ``jax.sharding.Mesh`` over all local devices with named axes
  ``("data", "model")``,
- batch tensors sharded on ``data`` (DP over ICI; XLA inserts the psum for
  gradient reduction automatically because params are replicated),
- optionally, wide conv-channel axes sharded on ``model`` (TP) — see
  :func:`shard_params_tp`,
- host->device transfer as a single sharded ``jax.device_put`` so each chip
  only receives its batch shard.

Multi-host extension point: ``initialize_distributed()`` wraps
``jax.distributed.initialize`` so the same mesh code spans hosts (DCN) when
launched under a multi-host runtime.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(require: bool = False, **kwargs) -> None:
    """Initialize the multi-host JAX runtime.

    Graceful only where failure is benign: already-initialized runtimes
    and bare single-process launches (no coordinator configured anywhere).
    If the caller clearly asked for multi-host — ``require=True`` (the
    CLIs' ``--multihost``), explicit kwargs, or a launcher/coordinator
    environment — a failed init RAISES: silently proceeding would leave
    every process training independently on the full duplicated batch
    stream with no error message.
    """
    import os

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # jax 0.9: "distributed.initialize should only be called once.";
        # older versions said "already initialized" — both are benign.
        msg = str(e).lower()
        if "only be called once" in msg or "already initialized" in msg:
            return
        raise
    except ValueError as e:
        wants_multihost = (
            require or bool(kwargs) or _multihost_env_configured(os)
        )
        if wants_multihost:
            raise
        print(f"[mesh] single-process run (distributed init skipped: {e})")


def _multihost_env_configured(os) -> bool:
    """Any sign that this process is one rank of a multi-process launch.

    Covers jax's own env knobs plus the cluster launchers jax
    auto-detects (SLURM / Open MPI) — a partially-configured one of
    these must raise, not silently fall back to single-process."""
    if any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES",
            "JAX_PROCESS_ID",
        )
    ):
        return True
    for k in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(os.environ.get(k, "1")) > 1:
                return True
        except ValueError:
            return True  # set-but-garbled launcher env: surface the error
    return False


@dataclasses.dataclass
class MeshContext:
    """A named device mesh plus the shardings every trainer needs."""

    mesh: Mesh

    # ---------------------------------------------------------- constructors
    @classmethod
    def create(
        cls,
        data: int | None = None,
        model: int = 1,
        *,
        devices: Sequence[jax.Device] | None = None,
    ) -> "MeshContext":
        devices = list(devices if devices is not None else jax.devices())
        n = len(devices)
        if data is None:
            data = n // model
        if data * model > n:
            raise ValueError(
                f"mesh {data}x{model} needs {data * model} devices, "
                f"have {n}"
            )
        # An explicit smaller mesh uses a device subset (useful for
        # single-chip comparisons and tests).
        arr = np.array(devices[: data * model]).reshape(data, model)
        return cls(mesh=Mesh(arr, axis_names=("data", "model")))

    @classmethod
    def create_hybrid(
        cls,
        dcn: int | None = None,
        data: int | None = None,
        model: int = 1,
        *,
        devices: Sequence[jax.Device] | None = None,
    ) -> "MeshContext":
        """A 3-axis ``("dcn", "data", "model")`` mesh for multi-slice pods.

        ``dcn`` is the cross-slice (data-center-network) axis: batches shard
        over ``dcn x data`` jointly, so the only cross-slice collective is
        the gradient psum — the bandwidth-light direction — while model-axis
        all-gathers stay on ICI inside a slice (the scaling-book layout).

        On real multi-slice hardware (``dcn`` matches the device topology's
        slice count) the device order comes from
        ``mesh_utils.create_hybrid_device_mesh`` so each ``(data, model)``
        plane is ICI-contiguous; on a single slice/host the axis is
        simulated by reshaping local devices (how the CPU tests and the
        driver's dry-run exercise this path).
        """
        devices = list(devices if devices is not None else jax.devices())
        n = len(devices)
        # Granule = slice where the platform exposes it (slice_index on
        # multislice TPU), else host process. Using process_index alone
        # would mis-count slices on multi-host-per-slice pods.
        n_granules = max(
            len({getattr(d, "slice_index", d.process_index)
                 for d in devices}), 1)
        if dcn is None:
            dcn = n_granules
        if data is None:
            data = n // (dcn * model)
        need = dcn * data * model
        if need > n or data < 1 or dcn < 1 or model < 1:
            raise ValueError(
                f"mesh {dcn}x{data}x{model} needs {need or 'positive'} "
                f"devices on every axis, have {n}"
            )
        if dcn > 1 and n_granules >= dcn:
            from jax.experimental import mesh_utils

            # Pick data*model devices from each of dcn granules — slicing
            # devices[:need] instead could land every device in one slice
            # when the pod has spare capacity (need < n).
            per = data * model
            by_granule: dict = {}
            for d in devices:
                gid = getattr(d, "slice_index", d.process_index)
                by_granule.setdefault(gid, []).append(d)
            full = [g for g in sorted(by_granule)
                    if len(by_granule[g]) >= per]
            if len(full) < dcn:
                sizes = {g: len(v) for g, v in sorted(by_granule.items())}
                raise ValueError(
                    f"hybrid mesh {dcn}x{data}x{model} needs {per} devices "
                    f"in each of {dcn} slices; slice sizes are {sizes}"
                )
            picked = [d for g in full[:dcn] for d in by_granule[g][:per]]
            arr = mesh_utils.create_hybrid_device_mesh(
                (data, model), (dcn, 1), devices=picked
            ).reshape(dcn, data, model)
        else:
            arr = np.array(devices[:need]).reshape(dcn, data, model)
        return cls(mesh=Mesh(arr, axis_names=("dcn", "data", "model")))

    # ------------------------------------------------------------ properties
    @property
    def n_dcn(self) -> int:
        return self.mesh.shape.get("dcn", 1)

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def dp_size(self) -> int:
        """Total data-parallel degree (cross-slice x intra-slice)."""
        return self.n_dcn * self.n_data

    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    @property
    def n_devices(self) -> int:
        return math.prod(self.mesh.shape.values())

    # ------------------------------------------------------------- shardings
    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def batch_sharding(self) -> NamedSharding:
        """Leading axis sharded over every data-parallel axis."""
        if "dcn" in self.mesh.axis_names:
            return self.sharding(("dcn", "data"))
        return self.sharding("data")

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    # ------------------------------------------------------------- transfers
    def put_batch(self, *arrays: Any):
        """Async host->device transfer of batch arrays, sharded on axis 0.

        Replaces the reference's per-batch ``.to(device)`` blocking copy
        (dcgan/data_loader.py:81-84) with a sharded device_put: each chip
        receives only its slice, over DMA, without a host gather.
        """
        out = tuple(
            jax.device_put(a, self.batch_sharding) for a in arrays
        )
        return out[0] if len(out) == 1 else out

    def put_batch_spatial(self, *arrays: Any):
        """SP transfer: axis 0 over DP, axis 1 (frame height) over the
        ``model`` axis.

        Spatial partitioning is the sharding for frames too large for one
        chip's HBM (SURVEY §5 long-context): each chip holds an H-stripe
        of every sample, and XLA's SPMD partitioner inserts the halo
        exchanges the convolutions need at stripe boundaries — no manual
        ppermute. Parameters stay replicated (SP and TP both spend the
        model axis; one run uses one of them). 1-D arrays (sample masks)
        shard over DP only.
        """
        sp = self.n_model
        dp = ("dcn", "data") if "dcn" in self.mesh.axis_names else "data"
        out = []
        for a in arrays:
            if getattr(a, "ndim", 0) >= 2:
                h = a.shape[1]
                if h % sp:
                    raise ValueError(
                        f"spatial axis: frame height {h} not divisible by "
                        f"model-axis size {sp}"
                    )
                out.append(jax.device_put(a, self.sharding(dp, "model")))
            else:
                out.append(jax.device_put(a, self.sharding(dp)))
        return out[0] if len(out) == 1 else out

    def put_megabatch(self, *arrays: Any, spatial: bool = False):
        """Host->device transfer of K-step staged batches (K, B, ...):
        axis 0 (steps) replicated, axis 1 (batch) sharded over DP.

        ``spatial=True`` additionally stripes axis 2 (frame height) of
        every rank>=3 array over the ``model`` axis — the megastep
        analogue of :meth:`put_batch_spatial` (masks of shape (K, B)
        shard over DP only); XLA inserts the same conv halo exchanges
        inside the scanned program."""
        dp = ("dcn", "data") if "dcn" in self.mesh.axis_names else "data"
        sharding = self.sharding(None, dp)
        if not spatial:
            out = tuple(jax.device_put(a, sharding) for a in arrays)
            return out[0] if len(out) == 1 else out
        sp = self.n_model
        out = []
        for a in arrays:
            if getattr(a, "ndim", 0) >= 3:
                h = a.shape[2]
                if h % sp:
                    raise ValueError(
                        f"spatial axis: frame height {h} not divisible "
                        f"by model-axis size {sp}"
                    )
                out.append(
                    jax.device_put(a, self.sharding(None, dp, "model")))
            else:
                out.append(jax.device_put(a, sharding))
        return out[0] if len(out) == 1 else tuple(out)

    def put_replicated(self, tree: Any):
        return jax.device_put(tree, self.replicated)

    def padded_batch_size(self, batch_size: int) -> int:
        """Smallest multiple of the data-parallel degree >= batch_size."""
        d = self.dp_size
        return ((batch_size + d - 1) // d) * d

    def pad_to_batch_multiple(self, *arrays: np.ndarray, batch_size: int):
        """Pad arrays on axis 0 to ``batch_size`` and return a sample mask.

        The reference tolerates ragged last batches (dcgan/train.py:99-100).
        Under jit we keep shapes static: pad to the fixed batch size and
        carry a float mask so masked reductions reproduce the reference's
        exact statistics.
        """
        n = arrays[0].shape[0]
        assert n <= batch_size, (n, batch_size)
        mask = np.zeros((batch_size,), np.float32)
        mask[:n] = 1.0
        padded = []
        for a in arrays:
            if n == batch_size:
                padded.append(a)
            else:
                pad = np.zeros((batch_size - n,) + a.shape[1:], a.dtype)
                padded.append(np.concatenate([a, pad], axis=0))
        return (*padded, mask)


def shard_params_tp(params, mesh_ctx: MeshContext, min_channels: int = 256):
    """Tensor-parallel sharding of wide conv kernels over the ``model`` axis.

    Any conv kernel (H, W, Cin, Cout) with Cout divisible by the model-axis
    size and >= min_channels gets its output-channel axis sharded; XLA then
    all-gathers activations where needed. With model=1 this is a no-op
    (fully replicated).
    """
    n_model = mesh_ctx.n_model

    def spec_for(path, leaf):
        if (
            n_model > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim == 4
            and leaf.shape[-1] >= min_channels
            and leaf.shape[-1] % n_model == 0
        ):
            return mesh_ctx.sharding(None, None, None, "model")
        return mesh_ctx.replicated

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = [spec_for(p, l) for p, l in flat]
    leaves = [jax.device_put(l, s) for (_, l), s in zip(flat, shardings)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def shard_net_state_tp(state, mesh_ctx: MeshContext,
                       min_channels: int = 256):
    """Tensor-parallel-shard a NetState: conv kernels AND their Adam
    moments (mu/nu mirror the param shapes) go over the ``model`` axis.
    Sharding only the params would leave the moments replicated and forfeit
    TP's memory saving; with both sharded, XLA keeps the optimizer update
    fully local to each model shard."""
    return state.replace(
        params=shard_params_tp(state.params, mesh_ctx, min_channels),
        opt_state=shard_params_tp(state.opt_state, mesh_ctx, min_channels),
    )


def cross_replica_mean(x, axis_name: str = "data"):
    """pmean helper for code running under shard_map."""
    return jax.lax.pmean(x, axis_name)


def local_batch_size(global_batch: int, mesh_ctx: MeshContext) -> int:
    if global_batch % mesh_ctx.dp_size != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel "
            f"degree {mesh_ctx.dp_size}"
        )
    return global_batch // mesh_ctx.dp_size
