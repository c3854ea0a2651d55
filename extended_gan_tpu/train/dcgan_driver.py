"""DCGAN training driver — `python -m dcgan` entry logic.

Parity with /root/reference/dcgan/train.py:178-265: seed 369, the same
params dict (:187-198), three Adam(lr=2e-4, betas=(0.5, 0.999)) optimizers,
per-epoch loader re-creation over the h5 train/test split, train +
eval-merge into TrainingHistory, grouped plots at the end.

TPU-native deltas: one fused jitted step (see dcgan_trainer), batch sharded
over the mesh data axis, bf16 compute opt-in, synthetic-data fallback when
the reference's /mnt path is absent.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp

from ..core import KeySeq
from ..data.streaming import get_h5_loaders
from ..models.dcgan import FrameDiscriminator, Generator, TemporalDiscriminator
from ..parallel import MeshContext
from ..utils.history import TrainingHistory
from .dcgan_trainer import (
    GANStates,
    make_dcgan_eval_step,
    make_dcgan_train_step,
    test,
    train_single_epoch,
)
from .optim import adam
from .state import create_net_state

DEFAULT_PARAMS = {
    "bsize": 128,       # batch size during training (reference :188)
    "imsize": 64,       # spatial size
    "nc": 4,            # frame channels
    "nz": 100,          # latent size (unused — G is conditional, :120)
    "ngf": 64,
    "ndf": 64,
    "nepochs": 10,
    "lr": 0.0002,
    "beta1": 0.5,
    "save_epoch": 2,
}
DEFAULT_DATA = "/mnt/tmp/multi_channel_train_test"


def build_dcgan(params: dict, *, precision: str = "f32", seed: int = 369,
                packed_g: bool = False):
    """Construct models, optimizers and initialized states.

    ``packed_g`` builds the generator in 2x2 space-to-depth layout
    (models/dcgan.py ``Generator(packed=True)``) — the identical function
    and param tree, so checkpoints interchange between the modes.
    """
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    nc, ndf, im = params["nc"], params["ndf"], params["imsize"]
    g_model = Generator(nc=nc, dtype=dtype, packed=packed_g)
    fd_model = FrameDiscriminator(nc=nc, ndf=ndf, dtype=dtype)
    td_model = TemporalDiscriminator(nc=nc, ndf=ndf, dtype=dtype)
    g_tx = adam(params["lr"], b1=params["beta1"])
    fd_tx = adam(params["lr"], b1=params["beta1"])
    td_tx = adam(params["lr"], b1=params["beta1"])
    keys = KeySeq(seed)
    sample = jnp.zeros((2, im, im, nc), jnp.float32)
    sample2 = jnp.zeros((2, im, im, 2 * nc), jnp.float32)
    states = GANStates(
        g=create_net_state(g_model, g_tx, keys.next(), sample),
        fd=create_net_state(fd_model, fd_tx, keys.next(), sample),
        td=create_net_state(td_model, td_tx, keys.next(), sample2),
    )
    models = (g_model, fd_model, td_model)
    txs = (g_tx, fd_tx, td_tx)
    return models, txs, states, keys


def train(
    *,
    data_location: str | None = None,
    epochs: int | None = None,
    train_batch_size: int = 32,
    test_batch_size: int = 64,
    precision: str = "f32",
    seed: int = 369,
    max_batches: int = 0,
    synthetic: bool = False,
    out_dir: str | None = None,
    params: dict | None = None,
    resume: bool = False,
    data_axis: int | None = None,
    model_axis: int = 1,
    tp_min_channels: int = 256,
    fsdp: bool = False,
    fsdp_min_size: int = 4096,
    spatial: bool = False,
    megastep: int = 0,
    resident: bool = False,
    fused_disc: bool = False,
    fused_prop: bool = False,
    packed_g: bool | None = None,
    profile: bool = False,
    profile_trace_dir: str = "",
):
    """``params["save_epoch"]`` (reference dcgan/train.py:197 — defined but
    never honored there) checkpoints the full GAN state (all three nets'
    params + BN stats + Adam moments, the PRNG stream, the epoch counter,
    the history) every N epochs; ``resume=True`` continues bit-exactly.

    ``data_axis``/``model_axis`` shape the device mesh: batches shard over
    ``data`` (DP); with ``model_axis > 1`` the discriminators' conv kernels
    (Cout >= tp_min_channels) and their Adam moments shard over ``model``
    (TP) — XLA inserts the all-gathers/reduce-scatters over ICI. With
    ``spatial=True`` the model axis instead shards the frame-height axis of
    every batch (SP: params replicated, activations striped, XLA inserts
    conv halo exchanges) — for frames too large for one chip's HBM.

    ``packed_g`` recomputes the generator in 2x2 space-to-depth layout
    (identical function/param tree; MXU-shaped convs). Currently opt-in
    (default off): the per-conv win is real but pack/unpack overhead
    leaves the forward near-neutral — see ops/space_to_depth.py."""
    params = {**DEFAULT_PARAMS, **(params or {})}
    if epochs is not None:
        params["nepochs"] = epochs

    data_location = data_location or DEFAULT_DATA
    if synthetic or not os.path.isdir(data_location):
        from ..data.synthetic import ensure_synthetic_h5

        print(f"[dcgan] data not found at {data_location}; using synthetic h5")
        data_location = ensure_synthetic_h5(
            None, frames_train=256, frames_test=64,
            h=params["imsize"], w=params["imsize"],
        )

    if spatial and model_axis > 1 and tp_min_channels <= 8192:
        # SP and TP both spend the model axis; default TP off under SP
        tp_min_channels = 1 << 30
    mesh = MeshContext.create(data=data_axis, model=model_axis)
    print(f"mesh: data={mesh.n_data} model={mesh.n_model}"
          + (" (spatial)" if spatial else ""))
    print("Random Seed: ", seed)

    if packed_g is None:
        # opt-in for now: per-conv TPU probes measure the packed convs
        # 1.2-1.5x faster but pack2/unpack2 (~0.17 ms/forward) eat most
        # of it; auto-ON awaits a full-fused-step win (probe_packed_g.py)
        packed_g = False
    if packed_g:
        print("[packed-g] generator in 2x2 space-to-depth layout")
    models, txs, states, keys = build_dcgan(
        params, precision=precision, seed=seed, packed_g=packed_g
    )
    def place(s: GANStates) -> GANStates:
        s = mesh.put_replicated(s)
        if mesh.n_model > 1:
            from ..parallel import shard_net_state_tp

            s = s.replace(
                fd=shard_net_state_tp(s.fd, mesh, tp_min_channels),
                td=shard_net_state_tp(s.td, mesh, tp_min_channels),
            )
        if fsdp and mesh.n_data > 1:
            from ..parallel import shard_net_state_fsdp

            s = s.replace(
                g=shard_net_state_fsdp(s.g, mesh, fsdp_min_size),
                fd=shard_net_state_fsdp(s.fd, mesh, fsdp_min_size),
                td=shard_net_state_fsdp(s.td, mesh, fsdp_min_size),
            )
        return s

    states = place(states)
    if fsdp and mesh.n_data > 1:
        print("[fsdp] params + Adam moments ZeRO-sharded over the data axis")
    elif fsdp:
        print("[fsdp] requested but the mesh data axis is 1 — nothing to "
              "shard (FSDP shards intra-slice over the data axis; on a "
              "hybrid mesh put DP on 'data', not only 'dcn')")
    if fused_disc:
        print("[fused-disc] doubled-batch discriminator passes "
              "(mixed real+fake BN statistics)")
    if fused_prop:
        print("[fused-prop] shared fake G->D pass, 2-cotangent backward "
              "(G trains against the PRE-update discriminators)")
    step = make_dcgan_train_step(*models, *txs, fused_disc=fused_disc,
                                 fused_prop=fused_prop)
    eval_step = make_dcgan_eval_step(*models)
    megastep_fn = None
    if megastep > 1 and not resident:
        from .dcgan_trainer import make_dcgan_megastep

        megastep_fn = make_dcgan_megastep(*models, *txs,
                                          fused_disc=fused_disc,
                                          fused_prop=fused_prop)
        print(f"[megastep] {megastep} steps per XLA program")

    # Device-resident training archive (--resident): frames transfer to
    # HBM once, windows gather on-device, epochs move only int32 index
    # programs — see data/resident.py and the conv-GAT driver's twin.
    resident_store = None
    resident_megastep_fn = None
    resident_eval_fn = None
    resident_test_store = None
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
            make_dcgan_resident_megastep,
        )

        resident_store = ResidentVideos.from_h5(
            os.path.join(data_location, "train"), mesh,
            in_seq_len=params["nc"], out_seq_len=params["nc"],
            crop=params["imsize"])
        resident_k = megastep if megastep > 1 else 8
        resident_megastep_fn = make_dcgan_resident_megastep(
            *models, *txs, in_seq_len=params["nc"],
            out_seq_len=params["nc"], fused_disc=fused_disc,
            fused_prop=fused_prop)
        # the test split goes resident too: eval batches gather on-device
        # and each K-batch program returns one small (num, denom) log
        # fetch — without this, resident epochs are EVAL-dominated on a
        # relay rig (VERDICT r4 #4b)
        from ..data.resident import (
            make_dcgan_resident_eval,
            resident_dcgan_test,
        )

        resident_test_store = ResidentVideos.from_h5(
            os.path.join(data_location, "test"), mesh,
            in_seq_len=params["nc"], out_seq_len=params["nc"],
            crop=params["imsize"])
        resident_eval_k = make_dcgan_resident_eval(
            *models, in_seq_len=params["nc"], out_seq_len=params["nc"])
        resident_eval_fn = lambda st: resident_dcgan_test(  # noqa: E731
            resident_eval_k, st, resident_test_store, k=resident_k,
            batch_size=test_batch_size)
        mb = (resident_store.video.nbytes
              + resident_test_store.video.nbytes) / 1e6
        print(f"[resident] {resident_store.n_windows} train + "
              f"{resident_test_store.n_windows} test windows / "
              f"{mb:.0f} MB live in device memory; K={resident_k} "
              "steps per program, index-only transfers")

    profiler = None
    if profile or profile_trace_dir:
        from ..utils.profiling import EpochProfiler

        profiler = EpochProfiler(trace_dir=profile_trace_dir)

    out_dir = out_dir or os.path.join(os.path.dirname(__file__), "..", "..",
                                      "dcgan")
    img_path = os.path.join(out_dir, "imgs")
    history = TrainingHistory(
        save_path=os.path.join(out_dir, "training_plots")
    )

    save_epoch = int(params.get("save_epoch") or 0)
    hist_path = os.path.join(out_dir, "history.json")
    from .checkpoint import setup_gan_checkpointing

    ckpt_mgr, states, start_epoch, keys, history, mid = \
        setup_gan_checkpointing(
            out_dir, resume=resume, save_epoch=save_epoch, states=states,
            keys=keys, place=place, history=history,
        )

    from .checkpoint import ckpt_step, empty_mid
    from .preempt import GracefulShutdown

    shutdown = GracefulShutdown().__enter__()
    try:
        for epoch in range(start_epoch, params["nepochs"] + 1):
            if resident_store is not None:
                # train AND eval run from HBM-resident stores:
                # constructing the streaming loaders (which decode their
                # first file eagerly) would be pure waste
                train_loader = test_loader = None
            else:
                train_loader, test_loader = get_h5_loaders(
                    data_location,
                    train_batch_size,
                    test_batch_size,
                    crop=params["imsize"],
                    in_seq_len=params["nc"],
                    out_seq_len=params["nc"],
                    seed=seed + epoch,
                )
            # mid-epoch resume: replay the loader past the consumed
            # batches (identical RNG draws -> bit-identical continuation)
            skip = int(mid["batch"]) if epoch == start_epoch else 0
            train_it = iter(train_loader) if train_loader is not None \
                else iter(())
            if skip and resident_store is not None:
                # resident epochs replay by program index (derived from
                # the restored batch count inside train_single_epoch);
                # the streaming iterator is unused
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
            states, train_result, mid_out = train_single_epoch(
                dataloader=train_it,
                states=states,
                step=step,
                mesh=mesh,
                batch_size=train_batch_size,
                rng_keys=keys,
                epoch=epoch,
                profiler=profiler,
                spatial=spatial,
                shutdown=shutdown,
                init_metrics=mid if skip else None,
                megastep_fn=megastep_fn,
                megastep_k=megastep,
                resident_store=resident_store,
                resident_megastep_fn=resident_megastep_fn,
                resident_k=resident_k,
                resident_perm_seed=seed,
                max_batches=max_batches,
            )
            if mid_out is not None:
                # step-granular preemption: snapshot inside the epoch
                if ckpt_mgr is not None:
                    import numpy as np

                    ckpt_mgr.save(
                        ckpt_step(epoch, int(mid_out["batch"])),
                        {"states": states, "epoch": epoch,
                         "key": np.asarray(keys.state), "mid": mid_out},
                    )
                    history.to_json(hist_path)
                    print(f"[preempt] stopped resumably mid-epoch {epoch} "
                          f"({int(mid_out['batch'])} batches in)")
                else:
                    print(f"[preempt] stopped mid-epoch {epoch} WITHOUT a "
                          "snapshot — no checkpointing configured (set "
                          "save_epoch / --save-epoch); progress is lost")
                break
            mid = empty_mid()
            if resident_eval_fn is not None:
                test_result = resident_eval_fn(states)
                if img_path is not None:
                    # first-batch viz parity: gather the first eval batch
                    # on-device, fetch only those windows + the fakes
                    import jax.numpy as jnp
                    import numpy as np

                    # min_batch=1 matches the metric path (the default 2
                    # would raise when every file yields a single window)
                    st0 = jnp.asarray(
                        resident_test_store.eval_programs(
                            1, min(8, test_batch_size),
                            min_batch=1)[0][0, 0])
                    w_in = params["nc"]
                    idx = (jnp.maximum(st0, 0)[:, None]
                           + jnp.arange(2 * w_in))
                    wins = jnp.moveaxis(
                        resident_test_store.video[idx], 1, -1)
                    xv = wins[..., :w_in]
                    yv = wins[..., w_in:]
                    fake, _ = eval_step(
                        states, xv, yv,
                        (st0 >= 0).astype(jnp.float32))
                    n = int(np.sum(np.asarray(st0) >= 0))
                    from ..utils.viz import visualize_predictions

                    visualize_predictions(
                        np.moveaxis(np.asarray(xv)[:n], -1, 1),
                        np.moveaxis(np.asarray(yv)[:n], -1, 1),
                        np.moveaxis(np.asarray(fake)[:n], -1, 1),
                        epoch, img_path,
                    )
            else:
                test_result = test(
                    test_loader, states, eval_step, mesh, test_batch_size,
                    epoch, img_path=img_path, spatial=spatial,
                )
            results = train_result | test_result
            print(json.dumps(results, indent=4))
            history.append(results)
            # read once: a SIGTERM between "should we save?" and "should we
            # stop?" must not break out without the checkpoint
            preempted = shutdown.requested
            if ckpt_mgr is not None and (
                (save_epoch and epoch % save_epoch == 0)
                or epoch == params["nepochs"]
                or preempted
            ):
                import numpy as np

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
