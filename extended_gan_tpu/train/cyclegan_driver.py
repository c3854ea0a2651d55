"""CycleGAN training driver — `python -m cycle_gan` entry logic.

Replaces the reference's broken cycle_gan/train.py (NameError at import,
cycle_gan/train.py:11-24) with the working dual-G/D + cycle-consistency
trainer. Data: the coastal-sea ``.pt`` variant the reference's cycle_gan
loader consumed (cycle_gan/data_loader.py == top-level data_loader.py),
default path ./datasets/data (cycle_gan/train.py:234), with synthetic
fallback.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..core import KeySeq
from ..data.streaming import get_coastal_loaders
from ..models.dcgan import FrameDiscriminator, Generator
from ..parallel import MeshContext
from ..utils.history import TrainingHistory
from ..utils.metrics import IncrementalTuple, MetricsManager
from .cyclegan_trainer import (
    CycleGANStates,
    make_cyclegan_eval_step,
    make_cyclegan_train_step,
)
from .dcgan_trainer import _feed
from .optim import adam
from .state import create_net_state

DEFAULT_DATA = "./datasets/data"


def build_cyclegan(
    *,
    nc: int = 4,
    ndf: int = 64,
    imsize: int = 64,
    lr: float = 2e-4,
    beta1: float = 0.5,
    cycle_lambda: float = 10.0,
    precision: str = "f32",
    seed: int = 369,
    packed_g: bool = False,
):
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    g_xy = Generator(nc=nc, dtype=dtype, packed=packed_g)
    g_yx = Generator(nc=nc, dtype=dtype, packed=packed_g)
    d_x = FrameDiscriminator(nc=nc, ndf=ndf, dtype=dtype)
    d_y = FrameDiscriminator(nc=nc, ndf=ndf, dtype=dtype)
    txs = tuple(adam(lr, b1=beta1) for _ in range(4))
    keys = KeySeq(seed)
    sample = jnp.zeros((2, imsize, imsize, nc), jnp.float32)
    states = CycleGANStates(
        g_xy=create_net_state(g_xy, txs[0], keys.next(), sample),
        g_yx=create_net_state(g_yx, txs[1], keys.next(), sample),
        d_x=create_net_state(d_x, txs[2], keys.next(), sample),
        d_y=create_net_state(d_y, txs[3], keys.next(), sample),
    )
    models = (g_xy, g_yx, d_x, d_y)
    step = make_cyclegan_train_step(*models, *txs, cycle_lambda=cycle_lambda)
    eval_step = make_cyclegan_eval_step(g_xy, g_yx)
    return models, txs, states, step, eval_step, keys




def train(
    *,
    data_location: str | None = None,
    epochs: int = 10,
    train_batch_size: int = 32,
    test_batch_size: int = 64,
    imsize: int = 64,
    nc: int = 4,
    ndf: int = 64,
    lr: float = 2e-4,
    cycle_lambda: float = 10.0,
    precision: str = "f32",
    seed: int = 369,
    max_batches: int = 0,
    synthetic: bool = False,
    out_dir: str | None = None,
    log_every: int = 50,
    save_epoch: int = 0,
    resume: bool = False,
    profile: bool = False,
    profile_trace_dir: str = "",
    data_axis: int | None = None,
    model_axis: int = 1,
    tp_min_channels: int = 256,
    fsdp: bool = False,
    fsdp_min_size: int = 4096,
    spatial: bool = False,
    packed_g: bool | None = None,
    megastep: int = 0,
    resident: bool = False,
):
    """``save_epoch`` > 0 checkpoints the full 4-net state (params + BN
    stats + Adam moments + PRNG stream + epoch + history) every N epochs;
    ``resume=True`` continues the run bit-exactly — the failure-recovery
    path the reference's (broken) cycle_gan trainer never had.
    ``spatial=True`` stripes the frame-height axis over the model axis
    (SP; params replicated, TP auto-disabled). ``megastep=K`` (K>1) scans
    K steps into one XLA program (same mode as dcgan/conv-GAT; composes
    with SP — the staged megabatch stripes the frame axis too)."""
    data_location = data_location or DEFAULT_DATA
    if synthetic or not os.path.isdir(data_location):
        from ..data.synthetic import ensure_synthetic_coastal

        print(f"[cycle_gan] data not found at {data_location}; "
              "using synthetic coastal-sea data")
        data_location = ensure_synthetic_coastal(
            None, frames_per_file=64, h=imsize, w=imsize,
        )

    profiler = None
    if profile or profile_trace_dir:
        from ..utils.profiling import EpochProfiler

        profiler = EpochProfiler(trace_dir=profile_trace_dir)

    if spatial and model_axis > 1 and tp_min_channels <= 8192:
        tp_min_channels = 1 << 30  # SP and TP both spend the model axis
    mesh = MeshContext.create(data=data_axis, model=model_axis)
    print(f"mesh: data={mesh.n_data} model={mesh.n_model}"
          + (" (spatial)" if spatial else ""))
    if packed_g is None:
        # opt-in for now — see dcgan_driver: pack/unpack overhead eats
        # most of the per-conv win; auto-ON awaits a fused-step win
        packed_g = False
    if packed_g:
        print("[packed-g] generators in 2x2 space-to-depth layout")
    models, txs, states, step, eval_step, keys = build_cyclegan(
        nc=nc, ndf=ndf, imsize=imsize, lr=lr, cycle_lambda=cycle_lambda,
        precision=precision, seed=seed, packed_g=packed_g,
    )
    megastep_fn = None
    if megastep > 1 and not resident:
        from .cyclegan_trainer import make_cyclegan_megastep

        megastep_fn = make_cyclegan_megastep(
            *models, *txs, cycle_lambda=cycle_lambda)
        print(f"[megastep] {megastep} steps per XLA program")

    # Device-resident training archive (--resident): the coastal .pt
    # frames transfer to HBM once; epochs gather windows on-device and
    # move only (K, B) int32 index programs — the dcgan/conv-GAT twins'
    # third sibling (data/resident.py).
    resident_store = None
    resident_megastep_fn = None
    resident_k = 0
    if resident:
        if spatial:
            raise ValueError(
                "--resident does not compose with --spatial: the resident "
                "gather runs INSIDE the jitted program and lands the "
                "batch DP-sharded over 'data'; SP would need an in-"
                "program reshard (an all-to-all per step) that recreates "
                "the transfer cost resident mode removes. Use --spatial "
                "with the streaming path, or --resident without SP")
        if train_batch_size % max(mesh.n_data, 1):
            raise ValueError(
                f"train_batch_size {train_batch_size} not divisible by "
                f"the mesh data axis {mesh.n_data} (resident programs "
                "shard the batch over 'data')")
        from ..data.resident import (
            ResidentVideos,
            make_cyclegan_resident_eval,
            make_cyclegan_resident_megastep,
            resident_cyclegan_test,
        )

        resident_store = ResidentVideos.from_pt_frames(
            os.path.join(data_location, "train"), mesh, seq_len=nc,
            crop=imsize)
        resident_k = megastep if megastep > 1 else 8
        resident_megastep_fn = make_cyclegan_resident_megastep(
            *models, *txs, seq_len=nc, cycle_lambda=cycle_lambda)
        # the test split goes resident too (it is the smaller one): eval
        # batches gather on-device and each K-batch program returns one
        # (num, denom) pair per metric — without this, epoch wall-clock
        # on a relay rig is EVAL-dominated once training stops streaming
        resident_test_store = ResidentVideos.from_pt_frames(
            os.path.join(data_location, "test"), mesh, seq_len=nc,
            crop=imsize)
        resident_eval_k = make_cyclegan_resident_eval(
            models[0], models[1], seq_len=nc)
        mb = (resident_store.video.nbytes
              + resident_test_store.video.nbytes) / 1e6
        print(f"[resident] {resident_store.n_windows} train + "
              f"{resident_test_store.n_windows} test windows / "
              f"{mb:.0f} MB live in device memory; K={resident_k} "
              "steps per program, index-only transfers")

    def place(s: CycleGANStates) -> CycleGANStates:
        s = mesh.put_replicated(s)
        if mesh.n_model > 1:
            from ..parallel import shard_net_state_tp

            # both discriminators' wide conv kernels + Adam moments over TP
            s = s.replace(
                d_x=shard_net_state_tp(s.d_x, mesh, tp_min_channels),
                d_y=shard_net_state_tp(s.d_y, mesh, tp_min_channels),
            )
        if fsdp and mesh.n_data > 1:
            from ..parallel import shard_net_state_fsdp

            s = s.replace(**{
                net: shard_net_state_fsdp(
                    getattr(s, net), mesh, fsdp_min_size)
                for net in ("g_xy", "g_yx", "d_x", "d_y")
            })
        return s

    states = place(states)
    if fsdp and mesh.n_data <= 1:
        print("[fsdp] requested but the mesh data axis is 1 — nothing to "
              "shard (FSDP shards intra-slice over the data axis; on a "
              "hybrid mesh put DP on 'data', not only 'dcn')")

    out_dir = out_dir or os.path.join(
        os.path.dirname(__file__), "..", "..", "cycle_gan")
    img_path = os.path.join(out_dir, "imgs")
    history = TrainingHistory(
        save_path=os.path.join(out_dir, "training_plots"))

    hist_path = os.path.join(out_dir, "history.json")
    from .checkpoint import setup_gan_checkpointing

    ckpt_mgr, states, start_epoch, keys, history, mid = \
        setup_gan_checkpointing(
            out_dir, resume=resume, save_epoch=save_epoch, states=states,
            keys=keys, place=place, history=history,
        )

    from ..utils.profiling import step_context
    from .checkpoint import ckpt_step, empty_mid
    from .preempt import GracefulShutdown

    step_cm = step_context(profiler)
    shutdown = GracefulShutdown().__enter__()
    try:
        for epoch in range(start_epoch, epochs + 1):
            if resident_store is not None:
                # train AND eval run from HBM-resident stores:
                # constructing the streaming loaders (which decode their
                # first file eagerly) would be pure waste
                train_loader = test_loader = None
            else:
                train_loader, test_loader = get_coastal_loaders(
                    data_location, train_batch_size, test_batch_size,
                    seq_len=nc, crop=imsize, seed=seed + epoch,
                )
            # mid-epoch resume: replay the loader past the consumed
            # batches (identical RNG draws -> bit-identical continuation)
            skip = int(mid["batch"]) if epoch == start_epoch else 0
            train_it = iter(train_loader) if train_loader is not None \
                else iter(())
            if skip and resident_store is not None:
                # resident epochs replay by program index (n_done below);
                # the streaming iterator is unused on that path
                print(f"[resume] resident replay: {skip} consumed batches "
                      f"of epoch {epoch}")
            elif skip:
                print(f"[resume] skipping {skip} consumed batches of "
                      f"epoch {epoch}")
                for _ in range(skip):
                    next(train_it)
            if max_batches:
                import itertools

                train_it = itertools.islice(
                    train_it, max(max_batches - skip, 0))

            train_mse = MetricsManager(("mse",), prefix="train")
            if skip:
                train_mse.metrics["mse"] += IncrementalTuple(mid["mse"])
            n_done = skip
            if profiler is not None:
                profiler.start_epoch()
            pending = []
            interrupted = False
            if resident_store is not None:
                import math as _math

                import jax as _jax

                perm_key = _jax.random.fold_in(
                    _jax.random.PRNGKey(seed), epoch)
                progs = resident_store.epoch_programs(
                    perm_key, resident_k, train_batch_size)
                n_prog = int(progs.shape[0])
                if max_batches:
                    n_prog = min(n_prog,
                                 _math.ceil(max_batches / resident_k))
                start_prog = n_done // resident_k  # resume, in programs
                for i in range(start_prog, n_prog):
                    rngs = jnp.stack(
                        [keys.next() for _ in range(resident_k)])
                    with step_cm():
                        states, logs = resident_megastep_fn(
                            states, resident_store.video, progs[i], rngs)
                    pending.append(logs["train_mse_nd"])
                    n_done += resident_k
                    if shutdown.requested:
                        interrupted = True
                        break
            elif megastep_fn is not None:
                from .dcgan_trainer import _megafeed

                next_log = skip  # batch index of the next periodic print
                for k, (xs, ys, ms) in _megafeed(
                    train_it, mesh, train_batch_size, megastep,
                    spatial=spatial
                ):
                    rngs = jnp.stack([keys.next() for _ in range(k)])
                    with step_cm():
                        states, logs = megastep_fn(states, xs, ys, ms, rngs)
                    pending.append(logs["train_mse_nd"])  # summed over k
                    n_done += k
                    # periodic print only: the float() fetches synchronize
                    # a device->host round trip — the very overhead the
                    # megastep amortizes (mirrors log_every batches)
                    if n_done > next_log:
                        next_log = n_done + log_every - 1
                        print(
                            f"Loss_G: {float(logs['g_loss']):.4f}\t"
                            f"cycle: {float(logs['cycle_loss']):.4f}\t"
                            f"Loss_DX: {float(logs['d_x_loss']):.4f}\t"
                            f"Loss_DY: {float(logs['d_y_loss']):.4f}"
                        )
                    if shutdown.requested:
                        interrupted = True
                        break
            else:
                for i, (x, y, mask) in enumerate(
                    _feed(train_it, mesh, train_batch_size, spatial=spatial)
                ):
                    with step_cm():
                        states, logs = step(states, x, y, mask, keys.next())
                    pending.append(logs["train_mse_nd"])
                    if i % log_every == 0:
                        print(
                            f"Loss_G: {float(logs['g_loss']):.4f}\t"
                            f"cycle: {float(logs['cycle_loss']):.4f}\t"
                            f"Loss_DX: {float(logs['d_x_loss']):.4f}\t"
                            f"Loss_DY: {float(logs['d_y_loss']):.4f}"
                        )
                    if shutdown.requested:
                        interrupted = True
                        n_done += i + 1
                        break
            import jax

            for nd in jax.device_get(pending):
                train_mse.metrics["mse"] += IncrementalTuple(nd)
            if interrupted:
                # step-granular preemption: snapshot inside the epoch
                if ckpt_mgr is not None:
                    m = empty_mid()
                    m["batch"] = np.int64(n_done)
                    m["mse"] = train_mse.metrics["mse"].val.copy()
                    ckpt_mgr.save(
                        ckpt_step(epoch, n_done),
                        {"states": states, "epoch": epoch,
                         "key": np.asarray(keys.state), "mid": m},
                    )
                    history.to_json(hist_path)
                    print(f"[preempt] stopped resumably mid-epoch {epoch} "
                          f"({n_done} batches in)")
                else:
                    print(f"[preempt] stopped mid-epoch {epoch} WITHOUT a "
                          "snapshot — no checkpointing configured (set "
                          "save_epoch / --save-epoch); progress is lost")
                break
            mid = empty_mid()
            prof_stats = {}
            if profiler is not None:
                prof_stats = profiler.end_epoch()
                print(f"Step timing: {json.dumps(prof_stats)}")

            # eval
            if resident_store is not None:
                eval_result = resident_cyclegan_test(
                    resident_eval_k, states, resident_test_store,
                    k=resident_k, batch_size=test_batch_size)
                if img_path is not None:
                    # first-batch viz: gather the FIRST eval batch
                    # on-device, fetch only those windows + the fakes.
                    # min_batch=1 matches the metric path — the default
                    # of 2 would raise when every file yields a single
                    # window. Deviation from streaming viz: the test
                    # loader reshuffles per epoch, so streaming rendered
                    # a different file's batch each time; resident viz
                    # deterministically renders file 0's first <=8
                    # windows (the metric contract is unaffected).
                    st0 = jnp.asarray(
                        resident_test_store.eval_programs(
                            1, min(8, test_batch_size),
                            min_batch=1)[0][0, 0])
                    idx = jnp.maximum(st0, 0)[:, None] + jnp.arange(2 * nc)
                    wins = jnp.moveaxis(
                        resident_test_store.video[idx], 1, -1)
                    xv, yv = wins[..., :nc], wins[..., nc:]
                    fake, _ = eval_step(
                        states, xv, yv, (st0 >= 0).astype(jnp.float32))
                    n = int(np.sum(np.asarray(st0) >= 0))
                    from ..utils.viz import visualize_predictions

                    visualize_predictions(
                        np.moveaxis(np.asarray(xv)[:n], -1, 1),
                        np.moveaxis(np.asarray(yv)[:n], -1, 1),
                        np.moveaxis(np.asarray(fake)[:n], -1, 1),
                        epoch, img_path,
                    )
            else:
                from .cyclegan_trainer import test as cyclegan_test

                eval_result = cyclegan_test(
                    test_loader, states, eval_step, mesh, test_batch_size,
                    epoch, img_path=img_path, spatial=spatial)
            results = train_mse.results() | eval_result | prof_stats
            print(json.dumps(results, indent=4))
            history.append(results)
            # read once: a SIGTERM between "should we save?" and "should we
            # stop?" must not break out without the checkpoint
            preempted = shutdown.requested
            if ckpt_mgr is not None and (
                (save_epoch and epoch % save_epoch == 0) or epoch == epochs
                or preempted
            ):
                # epoch-boundary snapshot == start of epoch+1 (sorts above
                # any mid-epoch snapshot of this epoch)
                ckpt_mgr.save(
                    ckpt_step(epoch + 1, 0),
                    {"states": states, "epoch": epoch,
                     "key": np.asarray(keys.state), "mid": empty_mid()},
                )
                history.to_json(hist_path)
            if preempted:
                if ckpt_mgr is not None:
                    print(f"[preempt] stopped resumably after epoch {epoch}")
                else:
                    print(f"[preempt] stopped after epoch {epoch} WITHOUT "
                          "a snapshot — no checkpointing configured (set "
                          "save_epoch / --save-epoch)")
                break
    finally:
        shutdown.__exit__()
    if ckpt_mgr is not None:
        ckpt_mgr.close()
    history.plot()
    return states, history
