"""conv-GAT / U-Net training driver — `python -m convolutional_gat` logic.

Parity with /root/reference/convolutional_gat/train.py:94-265: per-epoch
fresh loaders, LR print, MSE+sparsity train loss, val eval, plateau/step LR
scheduling, history.json, best-val checkpointing, per-epoch prediction and
history plots.
"""

from __future__ import annotations

import json
import os


import jax
import jax.numpy as jnp
import numpy as np

from ..core import KeySeq
from ..data.streaming import get_loaders
from ..models.registry import build_model
from ..parallel import MeshContext

from ..utils.history import plot_history, update_history
from ..utils.viz import visualize_gat_predictions
from .checkpoint import save_model
from .gat_trainer import (
    _prep_gat_batch,
    gat_feed,
    make_gat_eval_step,
    make_gat_train_step,
    test,
)
from .optim import ReduceLROnPlateau, StepLR, make_optimizer, set_learning_rate
from .state import create_net_state, param_count


def _empty_gat_mid() -> dict:
    """Fixed-shape v3 mid-epoch subtree for the GAT trainer: batches
    consumed into the epoch + the partial running-loss numerator and
    sample-count denominator (all zero = epoch-boundary semantics)."""
    return {
        "batch": np.int64(0),
        "loss": np.float64(0.0),
        "total": np.int64(0),
    }


def train_single_epoch(
    *,
    epoch: int,
    step,
    eval_step,
    state,
    scheduler,
    mesh,
    keys,
    history: dict,
    output_path: str,
    loader_factory,
    max_batches: int = 0,
    profiler=None,
    spatial: bool = False,
    train_batch_size: int | None = None,
    shutdown=None,
    start_batch: int = 0,
    init_running: tuple[float, int] = (0.0, 0),
    megastep_fn=None,
    megastep_k: int = 0,
    save_params_fn=None,
    resident_store=None,
    resident_megastep_fn=None,
    resident_k: int = 0,
    resident_perm_seed: int = 0,
    resident_eval_fn=None,
):
    """== convolutional_gat/train.py:94-155.

    Returns ``(state, test_result, mid)``. ``mid`` is None normally; when
    ``shutdown.requested`` fires mid-epoch the loop stops after the
    current step and ``mid`` carries the step-granular snapshot (batches
    consumed + partial loss numerator/denominator). On resume the driver
    passes ``start_batch`` (loader batches to replay-skip — identical RNG
    draws -> bit-identical continuation) and ``init_running`` (the
    restored partial sums).

    ``megastep_fn``/``megastep_k`` switch the loop to K-steps-per-program
    execution (``make_gat_megastep`` + ``gat_megafeed``): same update
    sequence and PRNG stream up to f32 reduction order, with per-program
    overhead paid once per K steps. Preemption granularity becomes K
    steps (the snapshot still lands on an exact loader-batch boundary, so
    resume stays exact).
    """
    fully_resident = (resident_store is not None
                      and resident_eval_fn is not None)
    if fully_resident:
        # both train and eval run from HBM-resident stores: constructing
        # the streaming loaders (which decode their first file eagerly)
        # would be pure waste
        train_loader = val_loader = None
    else:
        train_loader, val_loader, _test_loader = loader_factory(epoch=epoch)
    print(f"\nEpoch: {epoch}")
    print(f"LR: {scheduler.current()}")
    running_loss, total_length = float(init_running[0]), int(init_running[1])
    from ..utils.profiling import step_context

    step_cm = step_context(profiler)
    if profiler is not None:
        profiler.start_epoch()
    train_it = iter(train_loader) if train_loader is not None else iter(())
    if start_batch and resident_store is not None:
        # resident epochs replay by program index below; the streaming
        # iterator is unused (start_batch counts PROGRAMS on this path)
        print(f"[resume] resident replay: {start_batch} consumed programs "
              f"of epoch {epoch}")
    elif start_batch:
        print(f"[resume] skipping {start_batch} consumed batches of "
              f"epoch {epoch}")
        for _ in range(start_batch):
            next(train_it)
    pending = []  # device scalars; single fetch at epoch end (RTT-bound)
    interrupted = False
    n_done = start_batch
    if resident_store is not None:
        import math as _math

        import jax as _jax

        # epoch-derived permutation key: deterministic under resume (the
        # dropout KeySeq snapshot already sits at the interruption point,
        # so replay-skipped programs draw no keys)
        perm_key = _jax.random.fold_in(
            _jax.random.PRNGKey(resident_perm_seed), epoch)
        progs = resident_store.epoch_programs(
            perm_key, resident_k, train_batch_size)
        counts = resident_store.program_sample_counts(
            int(progs.shape[0]), resident_k, train_batch_size)
        n_prog = int(progs.shape[0])
        if max_batches:
            n_prog = min(n_prog, _math.ceil(max_batches / resident_k))
        for i in range(start_batch, n_prog):
            rngs = jnp.stack([keys.next() for _ in range(resident_k)])
            with step_cm():
                state, logs = resident_megastep_fn(
                    state, resident_store.video, progs[i], rngs)
            pending.append(logs["running_nd"])
            total_length += counts[i]
            n_done += 1
            if shutdown is not None and shutdown.requested:
                interrupted = True
                break
    elif megastep_fn is not None and megastep_k > 1:
        import itertools

        from .gat_trainer import gat_megafeed

        if max_batches:
            train_it = itertools.islice(
                train_it, max(max_batches - start_batch, 0))
        for consumed, n_samples, k, staged in gat_megafeed(
            train_it, mesh, megastep_k, batch_size=train_batch_size,
            spatial=spatial
        ):
            xs, ys, ms = staged
            rngs = jnp.stack([keys.next() for _ in range(k)])
            with step_cm():
                state, logs = megastep_fn(state, xs, ys, ms, rngs)
            pending.append(logs["running_nd"])  # summed over the k steps
            total_length += n_samples
            n_done += consumed
            if shutdown is not None and shutdown.requested:
                interrupted = True
                break
    else:
        for i, (n, batch) in enumerate(
            gat_feed(train_it, mesh, spatial=spatial,
                     batch_size=train_batch_size)
        ):
            if max_batches and i >= max_batches - start_batch:
                break
            if n <= 1:
                if shutdown is not None and shutdown.requested:
                    interrupted = True
                    n_done += i + 1
                    break
                continue
            xd, yd, mask = batch
            with step_cm():
                state, logs = step(state, xd, yd, mask, keys.next())
            pending.append(logs["running_nd"])
            total_length += n
            if shutdown is not None and shutdown.requested:
                interrupted = True
                n_done += i + 1
                break
    import jax

    for nd in jax.device_get(pending):
        running_loss += nd[0]
    if interrupted:
        print(f"[preempt] epoch {epoch} interrupted after {n_done} batches")
        return state, None, {
            "batch": n_done,
            "loss": float(running_loss),
            "total": int(total_length),
        }
    if profiler is not None:
        prof_stats = profiler.end_epoch()
        print(f"Step timing: {json.dumps(prof_stats)}")
        for k, v in prof_stats.items():
            history.setdefault(k, []).append(v)
    train_loss = running_loss / max(total_length, 1)
    print(f"Train loss: {round(float(train_loss), 6)}")
    history["train_loss"].append(float(train_loss))

    if resident_eval_fn is not None:
        test_result = resident_eval_fn(state)
    else:
        test_result = test(eval_step, state, val_loader, mesh,
                           spatial=spatial)
    new_lr = scheduler.step(test_result["val_loss"])
    set_learning_rate(state.opt_state, new_lr)
    print(json.dumps(test_result, indent=4))
    update_history(history, test_result)
    if output_path:
        os.makedirs(output_path, exist_ok=True)
        with open(os.path.join(output_path, "history.json"), "w") as f:
            json.dump(history, f, indent=4)
        # best-val checkpoint (reference :151-155)
        if len(history["val_loss"]) == 1 or test_result["val_loss"] < min(
            history["val_loss"][:-1]
        ):
            print("Saving model.")
            save_model(
                os.path.join(output_path, "model.msgpack"),
                # PP hands a stacked->canonical converter here so the
                # artifact stays loadable by compare_models/create_plots
                save_params_fn(state.params) if save_params_fn
                else state.params,
                state.batch_stats,
            )
    return state, test_result, None


def train(
    *,
    model_type: str = "temporal",
    optimizer: str = "adam",
    mapping_type: str = "linear",
    output_path: str = "",
    train_batch_size: int = 32,
    test_batch_size: int = 64,
    epochs: int = 10,
    learning_rate: float = 1e-3,
    lr_step: int = 1,
    gamma: float = 0.95,
    plot: bool = True,
    criterion: str = "mse",
    weight_decay: float = 0.01,
    downsample_size=(256, 256),
    preprocessed_folder: str = "",
    dataset: str = "kmni",
    test_first: bool = False,
    reduce_lr_on_plateau: bool = False,
    precision: str = "f32",
    seed: int = 369,
    max_batches: int = 0,
    resume: bool = False,
    checkpoint_every: int = 0,
    remat: bool = False,
    shuffle_mode: str = "batch",
    data_axis: int | None = None,
    model_axis: int = 1,
    tp_min_channels: int = 256,
    fsdp: bool = False,
    fsdp_min_size: int = 4096,
    spatial: bool = False,
    use_pallas: bool | None = None,
    conv_impl: str = "auto",
    megastep: int = 0,
    resident: bool = False,
    moe_experts: int = 0,
    moe_aux_weight: float = 0.01,
    pipeline_stages: int = 0,
    pp_microbatches: int = 0,
    profile: bool = False,
    profile_trace_dir: str = "",
    **_ignored,
):
    """== convolutional_gat/train.py:158-265 (same kwargs, same flow).

    ``data_axis``/``model_axis`` (config keys DATA_AXIS / MODEL_AXIS) shape
    the device mesh: batch DP over ``data``; with ``model_axis > 1`` wide
    conv kernels (>= tp_min_channels output channels — the SmaAt-UNet
    mapping/model paths) and their Adam moments shard over ``model``.
    ``spatial=True`` (config key SPATIAL) instead stripes the frame-width
    axis of every batch over the model axis (SP; params replicated).
    ``use_pallas`` (config key USE_PALLAS) selects the fused Pallas
    kernels (GAT attention; SmaAt-UNet DSC). Default ``None`` = auto: ON
    when running on TPU (the fused attention measures ~16% faster at the
    bench geometry with exact-f32 numerics, BENCH_NOTES round 3), OFF
    elsewhere (the CPU fallback is interpret-mode, far slower than the
    unfused XLA path). Pass an explicit True/False to override."""
    if pipeline_stages > 1:
        # PP (config key PIPELINE_STAGES): GPipe stages over the model
        # axis for the stacked GAT families (parallel/pipeline.py). PP
        # spends the model axis, so it excludes TP and SP; the megastep's
        # scan-of-shard_map composition is not offered on this driver
        # path (launch PP xor megastep).
        if model_type not in ("baseline",):
            raise ValueError(
                "pipeline_stages covers the stacked GAT families "
                f"(model_type 'baseline'); got {model_type!r}")
        if spatial or megastep or moe_experts:
            raise ValueError(
                "pipeline_stages does not compose with spatial/megastep/"
                "moe_experts on this driver path")
        if model_axis not in (1, pipeline_stages):
            raise ValueError(
                f"model_axis {model_axis} conflicts with pipeline_stages "
                f"{pipeline_stages} (PP owns the model axis)")
        model_axis = pipeline_stages
        tp_min_channels = 1 << 30  # PP and TP both spend the model axis
    if spatial and model_axis > 1 and tp_min_channels <= 8192:
        tp_min_channels = 1 << 30  # SP and TP both spend the model axis
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if conv_impl == "auto":
        # "chanfirst" (positions-on-lanes mapping) becomes the auto pick
        # if/when the on-chip A/B shows a win (BENCH_NOTES round 5)
        conv_impl = "nhwc"
    mesh = MeshContext.create(data=data_axis, model=model_axis)
    keys = KeySeq(seed)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    downsample_size = tuple(downsample_size)
    print(f"Using mesh: data={mesh.n_data} model={mesh.n_model}")

    if dataset == "kmni" and not os.path.isdir(
        os.path.join(preprocessed_folder, "train")
    ):
        print(f"[conv_gat] dataset not found at {preprocessed_folder!r}; "
              "using synthetic")
        dataset = "synthetic"
        preprocessed_folder = ""

    def loader_factory(train_bs=train_batch_size, test_bs=test_batch_size,
                       shuffle=True, epoch=0):
        # seed + epoch: the reference's fresh per-epoch loaders advance the
        # global torch RNG, so every epoch sees a new order; a constant
        # seed here would replay the identical batch sequence every epoch
        return get_loaders(
            train_bs, test_bs, preprocessed_folder, None,
            dataset=dataset, downsample_size=downsample_size,
            merge_nodes=False, shuffle=shuffle, seed=seed + epoch,
            shuffle_mode=shuffle_mode,
        )

    # probe a val batch for (H, W, T, V) — reference :191-197
    _, val_loader, _ = loader_factory()
    x, _y = next(val_loader)
    _, image_width, image_height, steps, n_vertices = x.shape

    model = build_model(
        model_type,
        image_width=image_width,
        image_height=image_height,
        n_vertices=n_vertices,
        mapping_type=mapping_type,
        time_steps=steps,
        dtype=dtype,
        use_pallas=use_pallas,
        conv_impl=conv_impl,
        moe_experts=moe_experts,
    )
    tx = make_optimizer(optimizer, learning_rate,
                        weight_decay=weight_decay)
    state = create_net_state(
        model, tx, keys.next(),
        jnp.zeros((2, image_width, image_height, steps, n_vertices),
                  jnp.float32),
    )

    pp = None
    if pipeline_stages > 1:
        from ..parallel.pipeline import BaselineGatPP

        mb = pp_microbatches or 2 * pipeline_stages
        for name, bs in (("train_batch_size", train_batch_size),
                         ("test_batch_size", test_batch_size)):
            if bs % mb:
                raise ValueError(
                    f"{name} {bs} not divisible by pp_microbatches {mb}")
            if (bs // mb) % mesh.n_data:
                # each microbatch is itself DP-sharded over the data axis
                # (pipeline.py in_specs P(None, 'data'))
                raise ValueError(
                    f"per-microbatch size {bs // mb} ({name} {bs} / "
                    f"{mb} microbatches) not divisible by the mesh data "
                    f"axis {mesh.n_data}")
        pp = BaselineGatPP(model, mesh, mb)
        # canonical params -> stage-stacked + stage-sharded; optimizer
        # moments re-initialized on the stacked tree (zeros — nothing
        # learned yet) so they inherit the stage sharding
        pp_params = pp.prepare(state.params)
        state = state.replace(params=pp_params,
                              opt_state=tx.init(pp_params))
        print(f"[pp] {pipeline_stages} pipeline stages x {mb} "
              "microbatches; each model-axis device holds 1/"
              f"{pipeline_stages} of the params")

    def place(s):
        if pp is not None:
            # stage-stacked leaves over 'model', scalars replicated
            return pp.place(s)
        s = mesh.put_replicated(s)
        if mesh.n_model > 1:
            from ..parallel import shard_net_state_tp

            s = shard_net_state_tp(s, mesh, tp_min_channels)
        if moe_experts and mesh.n_data > 1 \
                and moe_experts % mesh.n_data == 0:
            # EP BEFORE FSDP: each data-axis device holds E/D experts
            # (+ moments), and fsdp.py's skip rule then leaves the
            # already-data-sharded expert stacks alone instead of
            # resharding them (fsdp.py:55)
            from ..parallel.expert import shard_tree_moe_ep

            s = s.replace(
                params=shard_tree_moe_ep(s.params, mesh, moe_experts),
                opt_state=shard_tree_moe_ep(
                    s.opt_state, mesh, moe_experts),
            )
        if fsdp and mesh.n_data > 1:
            from ..parallel import shard_net_state_fsdp

            s = shard_net_state_fsdp(s, mesh, fsdp_min_size)
        return s

    state = place(state)
    if fsdp and mesh.n_data <= 1:
        print("[fsdp] requested but the mesh data axis is 1 — nothing to "
              "shard (FSDP shards intra-slice over the data axis; on a "
              "hybrid mesh put DP on 'data', not only 'dcn')")
    print(f"Number of parameters: {param_count(state)}")
    print(f"Using mapping: {model.mapping_type}")

    aux_w = moe_aux_weight if moe_experts else 0.0
    fwd_override = pp.forward if pp is not None else None
    step = make_gat_train_step(model, tx, remat=remat,
                               criterion=criterion, moe_aux_weight=aux_w,
                               forward_override=fwd_override)
    eval_step = make_gat_eval_step(model, forward_override=fwd_override)
    megastep_fn = None
    if megastep > 1 and not resident:
        from .gat_trainer import make_gat_megastep

        megastep_fn = make_gat_megastep(model, tx, remat=remat,
                                        criterion=criterion,
                                        moe_aux_weight=aux_w)
        print(f"[megastep] {megastep} steps per XLA program")

    # Device-resident training archive (config key RESIDENT / --resident):
    # the decoded split transfers to HBM once; epochs gather windows
    # on-device and move only (K, B) int32 index programs per K steps —
    # the cure for the reference's per-batch host->device copy
    # (kmni_data_loader.py:115), which dominates wall-clock on a
    # relay-attached chip (BENCH_NOTES round 4: the disk feed ran at
    # 1.6-4.7% of the device rate; resident runs at ~the synthetic rate).
    resident_store = None
    resident_megastep_fn = None
    resident_eval_fn = None
    resident_k = 0
    if resident:
        if dataset not in ("kmni", "synthetic", "arai"):
            raise ValueError(
                f"--resident supports the kmni/synthetic/arai datasets, "
                f"not {dataset!r}")
        if pp is not None:
            raise ValueError("--resident and --pipeline-stages are "
                             "mutually exclusive (launch one)")
        if spatial:
            raise ValueError(
                "--resident does not compose with --spatial: the resident "
                "gather runs INSIDE the jitted program and lands the "
                "batch DP-sharded over 'data'; SP would need an in-"
                "program reshard of every gathered batch onto the "
                "('data', 'model') frame-axis layout — an all-to-all per "
                "step that recreates the transfer cost resident mode "
                "exists to remove. Use --spatial with the streaming path "
                "(it shards on the host->device transfer), or --resident "
                "without SP: the resident workloads fit one chip's HBM "
                "by construction")
        if train_batch_size % max(mesh.n_data, 1):
            raise ValueError(
                f"train_batch_size {train_batch_size} not divisible by "
                f"the mesh data axis {mesh.n_data} (resident programs "
                "shard the batch over 'data')")
        from ..data.resident import (
            ResidentVideos,
            make_gat_resident_eval,
            make_gat_resident_megastep,
            resident_gat_test,
        )

        folder = preprocessed_folder
        if dataset == "synthetic":
            from ..data.synthetic import ensure_synthetic_kmni

            folder = ensure_synthetic_kmni(preprocessed_folder or None)
        if dataset == "arai":
            # ARAI splits are training/validation (metadata-driven on the
            # streaming path); identity normalization
            resident_store = ResidentVideos.from_arai(
                os.path.join(folder, "training"), mesh, time_steps=steps,
                downsample_size=downsample_size)
        else:
            resident_store = ResidentVideos.from_kmni(
                os.path.join(folder, "train"), mesh, time_steps=steps,
                crop=downsample_size[0])
        resident_k = megastep if megastep > 1 else 8
        resident_megastep_fn = make_gat_resident_megastep(
            model, tx, time_steps=steps, remat=remat, criterion=criterion,
            moe_aux_weight=aux_w)
        # the val split goes resident too (it is the smaller split): eval
        # batches gather on-device and each K-batch program returns one
        # (6,) metric-sum vector — without this, epoch wall-clock on a
        # relay rig is EVAL-dominated once training stops streaming
        if dataset == "arai":
            resident_val_store = ResidentVideos.from_arai(
                os.path.join(folder, "validation"), mesh, time_steps=steps,
                downsample_size=downsample_size)
        else:
            resident_val_store = ResidentVideos.from_kmni(
                os.path.join(folder, "test"), mesh, time_steps=steps,
                crop=downsample_size[0])
        resident_eval_k = make_gat_resident_eval(
            model, time_steps=steps, power=resident_val_store.power,
            normalizing_max=resident_val_store.normalizing_max)
        resident_eval_fn = lambda st: resident_gat_test(  # noqa: E731
            resident_eval_k, st, resident_val_store, k=resident_k,
            batch_size=test_batch_size)
        mb = (resident_store.video.nbytes
              + resident_val_store.video.nbytes) / 1e6
        print(f"[resident] {resident_store.n_windows} train + "
              f"{resident_val_store.n_windows} val windows / "
              f"{mb:.0f} MB live in device memory; K={resident_k} "
              "steps per program, index-only transfers")

    scheduler = (
        ReduceLROnPlateau(learning_rate, factor=0.5, patience=0)
        if reduce_lr_on_plateau
        else StepLR(learning_rate, lr_step, gamma)
    )

    profiler = None
    if profile or profile_trace_dir:
        from ..utils.profiling import EpochProfiler

        profiler = EpochProfiler(trace_dir=profile_trace_dir)

    history: dict = {"train_loss": []}
    start_epoch = 1
    ckpt_mgr = None
    mid = _empty_gat_mid()
    if output_path and (resume or checkpoint_every):
        from .checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(
            os.path.join(output_path, "checkpoints"), max_to_keep=2
        )
        if resume and ckpt_mgr.latest_step() is not None:
            template = {"state": state, "epoch": 0, "lr": learning_rate,
                        "best": float("inf"),
                        "key": np.asarray(keys.state)}
            if ckpt_mgr.sidecar_version() >= 3:
                template["mid"] = _empty_gat_mid()
            try:
                restored = ckpt_mgr.restore(template)
            except Exception:
                # pre-round-2 checkpoints carry no PRNG stream
                template.pop("key")
                template.pop("mid", None)
                restored = ckpt_mgr.restore(template)
                print("[resume] old checkpoint without a PRNG stream; "
                      "dropout keys restart from the seed")
            if "key" in restored:
                keys = KeySeq(jnp.asarray(restored["key"]))
            state = place(restored["state"])
            mid = restored.get("mid", _empty_gat_mid())
            mid = {k: np.asarray(v) for k, v in mid.items()}
            if int(mid["batch"]) > 0:
                start_epoch = int(restored["epoch"])  # redo, mid-way
                print(f"[resume] restored mid-epoch snapshot: epoch "
                      f"{start_epoch}, {int(mid['batch'])} batches done; "
                      f"continuing inside the epoch")
            else:
                start_epoch = int(restored["epoch"]) + 1
                print(f"[resume] restored epoch {start_epoch - 1}; "
                      f"continuing at {start_epoch}")
            # restore the schedule, not just the value: StepLR derives the
            # LR from its epoch counter; plateau carries lr + best metric
            # (mid-epoch snapshots hold the PRE-epoch schedule: the
            # scheduler only steps at the epoch's validation pass)
            if isinstance(scheduler, ReduceLROnPlateau):
                scheduler.lr = float(restored["lr"])
                best = float(restored.get("best", float("inf")))
                scheduler.best = None if best == float("inf") else best
            else:
                scheduler.epoch = start_epoch - 1
            set_learning_rate(state.opt_state, scheduler.current())
            hist_path = os.path.join(output_path, "history.json")
            if os.path.exists(hist_path):
                with open(hist_path) as f:
                    history = json.load(f)

    if test_first:
        tr_l, _, te_l = loader_factory()
        result = test(eval_step, state, tr_l, mesh, spatial=spatial)
        history["train_loss"].append(result["val_loss"])
        result = test(eval_step, state, te_l, mesh, spatial=spatial)
        print(f"Test loss (without any training): {result['val_loss']:.6f}")
        update_history(history, result)
        print(json.dumps(result, indent=4))

    from .preempt import GracefulShutdown

    from .checkpoint import ckpt_step

    shutdown = GracefulShutdown().__enter__()
    try:
        for epoch in range(start_epoch, epochs + 1):
            skip = int(mid["batch"]) if epoch == start_epoch else 0
            state, _, mid_out = train_single_epoch(
                epoch=epoch, step=step, eval_step=eval_step, state=state,
                scheduler=scheduler, mesh=mesh, keys=keys, history=history,
                output_path=output_path, loader_factory=loader_factory,
                max_batches=max_batches, profiler=profiler, spatial=spatial,
                train_batch_size=train_batch_size, shutdown=shutdown,
                start_batch=skip,
                init_running=(float(mid["loss"]), int(mid["total"]))
                if skip else (0.0, 0),
                megastep_fn=megastep_fn, megastep_k=megastep,
                save_params_fn=pp.unprepare if pp is not None else None,
                resident_store=resident_store,
                resident_megastep_fn=resident_megastep_fn,
                resident_k=resident_k, resident_perm_seed=seed,
                resident_eval_fn=resident_eval_fn,
            )
            if mid_out is not None:
                # step-granular preemption: snapshot inside the epoch
                if ckpt_mgr is not None:
                    best = getattr(scheduler, "best", None)
                    ckpt_mgr.save(
                        ckpt_step(epoch, int(mid_out["batch"])),
                        {"state": state, "epoch": epoch,
                         "lr": float(scheduler.current()),
                         "best": float("inf") if best is None
                         else float(best),
                         "key": np.asarray(keys.state),
                         "mid": {k: np.asarray(v)
                                 for k, v in mid_out.items()}},
                    )
                    print(f"[preempt] stopped resumably mid-epoch {epoch} "
                          f"({int(mid_out['batch'])} batches in)")
                else:
                    print(f"[preempt] stopped mid-epoch {epoch} WITHOUT a "
                          "snapshot — no checkpointing configured (set "
                          "CHECKPOINT_EVERY / checkpoint_every); progress "
                          "is lost")
                break
            mid = _empty_gat_mid()
            if output_path:
                _, viz_loader, _ = loader_factory(2, 2)
                visualize_gat_predictions(
                    lambda xb: _predict_batch(eval_step, state, mesh, xb,
                                              spatial=spatial),
                    viz_loader, epoch=epoch, path=output_path,
                    power=float(getattr(viz_loader, "power", 1.0)),
                )
                plot_history(
                    history, title="Training History", save=True,
                    filename=os.path.join(output_path, f"history_{epoch}.png"),
                )
            # read once: a SIGTERM between "should we save?" and "should we
            # stop?" must not break out without the checkpoint
            preempted = shutdown.requested
            if ckpt_mgr is not None and (
                not checkpoint_every or epoch % checkpoint_every == 0
                or epoch == epochs or preempted
            ):
                best = getattr(scheduler, "best", None)
                # epoch-boundary snapshot == start of epoch+1 (sorts above
                # any mid-epoch snapshot of this epoch)
                ckpt_mgr.save(
                    ckpt_step(epoch + 1, 0),
                    {"state": state, "epoch": epoch,
                     "lr": float(scheduler.current()),
                     "best": float("inf") if best is None else float(best),
                     # the dropout-key stream: a resumed run must CONTINUE
                     # it, not replay epochs 1..N's masks from the seed
                     "key": np.asarray(keys.state),
                     "mid": _empty_gat_mid()},
                )
            if preempted:
                if ckpt_mgr is not None:
                    print(f"[preempt] stopped resumably after epoch {epoch}")
                else:
                    print(f"[preempt] stopped after epoch {epoch} WITHOUT "
                          "a snapshot — no checkpointing configured (set "
                          "CHECKPOINT_EVERY / checkpoint_every)")
                break
    finally:
        shutdown.__exit__()
    if ckpt_mgr is not None:
        ckpt_mgr.close()
    return state, history


def _predict_batch(eval_step, state, mesh, xb, spatial=False):
    xb = np.asarray(xb, np.float32)
    xd, yd, mask = _prep_gat_batch(mesh, xb, xb, spatial=spatial)
    out = eval_step(state, xd, yd, mask, 0.5, 1.0, power=1.0)
    return np.asarray(out["y_hat"])[: len(xb)]
