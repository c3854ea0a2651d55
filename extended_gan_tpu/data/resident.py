"""Device-resident datasets: the whole training archive lives in HBM.

The reference streams files from disk and pays a host->device copy per
batch (kmni_data_loader.py:115, dcgan/data_loader.py:81-84) — free on a
co-located GPU, but on a relay-attached TPU that copy is a full link RTT
per step and dominates wall-clock (BENCH_r03 ``pipeline_fed``: the
disk-backed feed ran at 1.6-4.7% of the synthetic-device rate). The KNMI
20x20 training set is a few hundred MB against 16 GB of HBM, so the
TPU-first design is to stop streaming entirely:

- every video is decoded, truncated, cropped, normalized and transferred
  ONCE at construction (:class:`ResidentVideos`),
- window construction is a gather BY START INDEX inside the training
  program (the same semantics the native host core
  ``native/egt_native.cpp::kmni_make_batch`` implements, moved on-device),
- the epoch shuffle is a device-side ``jax.random.permutation`` under the
  epoch PRNG key,
- steady-state training transfers ONLY a (K, B) int32 start-index array
  per K-step megastep program — a few KB instead of K full batches.

Epoch statistics match the streaming loaders exactly: same
truncate-to-multiple window universe, stride-1 starts, never spanning
file boundaries (tests/test_resident.py proves batch-for-batch equality
against :class:`~extended_gan_tpu.data.streaming.KmniLoader` and
:class:`~extended_gan_tpu.data.streaming.H5SequenceLoader` with shuffling
off). The ragged epoch tail is padded with start ``-1`` and masked, the
same static-shape discipline :meth:`MeshContext.pad_to_batch_multiple`
uses on the streaming path.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .io import load_array
from .windowing import truncate_to_multiple


def _list_video_files(folder: str) -> list[str]:
    files = [os.path.join(folder, fn) for fn in sorted(os.listdir(folder))]
    return [f for f in files if not f.endswith((".json", ".md"))]


class ResidentVideos:
    """A training split resident in device memory.

    Attributes:
        video: (sum_T, ...) normalized f32 device array, replicated over
            the mesh (frame axis leads; per-frame layout depends on the
            constructor — ``(H, W, V)`` for KNMI, ``(H, W)`` for h5).
        starts: (n_windows,) int32 device array of valid window-start
            frames (file boundaries respected: a start never indexes a
            window crossing into the next file).
        window: frames per window (in + out).
    """

    def __init__(self, video: np.ndarray, starts: np.ndarray, window: int,
                 mesh=None, *, power: float = 1.0,
                 normalizing_max: float = 1.0,
                 file_starts: list[np.ndarray] | None = None):
        put = (mesh.put_replicated if mesh is not None
               else functools.partial(jax.device_put))
        self.video = put(jnp.asarray(video, jnp.float32))
        self.starts = put(jnp.asarray(starts, jnp.int32))
        self.window = int(window)
        self.n_windows = int(len(starts))
        self._mesh = mesh
        # eval-time denormalization contract (streaming-loader parity)
        self.power = power
        self.normalizing_max = normalizing_max
        # per-file start lists (host-side): eval_programs builds
        # composition-faithful batches from these — the streaming loaders
        # batch consecutive windows of ONE file (never spanning files),
        # and the per-batch data-driven eval threshold makes batch
        # COMPOSITION part of the metric contract
        self.file_starts = file_starts or []

    # ------------------------------------------------------------ builders
    @classmethod
    def from_kmni(cls, folder: str, mesh=None, *, time_steps: int = 4,
                  crop: int | None = None, power: float = 1.0,
                  max_value: float = 254.0):
        """KNMI .pt videos -> one resident (sum_T, H, W, V) array.

        Per-file preparation mirrors KmniLoader exactly
        (streaming.py::KmniLoader): truncate to a multiple of 2*time_steps,
        crop H/W, value/max_value then ``** power``; stride-1 window starts
        within each truncated file.
        """
        w = 2 * time_steps
        chunks, starts, offset = [], [], 0
        for path in _list_video_files(folder):
            data = truncate_to_multiple(np.asarray(load_array(path)), w)
            if len(data) < w:
                continue
            data = data.astype(np.float32) / max_value
            if power != 1.0:
                data = data**power
            if crop is not None:
                data = data[:, :, :crop, :crop]
            # (T, V, H, W) -> (T, H, W, V): the gather then yields batches
            # already in the trainer's (B, H, W, S, V) layout sans one
            # cheap window-axis move
            chunks.append(np.ascontiguousarray(data.transpose(0, 2, 3, 1)))
            starts.append(offset + np.arange(len(data) - w + 1))
            offset += len(data)
        if not chunks:
            raise ValueError(f"no usable videos under {folder!r}")
        return cls(np.concatenate(chunks), np.concatenate(starts), w, mesh,
                   power=power, normalizing_max=max_value,
                   file_starts=starts)

    @classmethod
    def from_h5(cls, folder: str, mesh=None, *, in_seq_len: int = 4,
                out_seq_len: int = 4, crop: int | None = 64):
        """dcgan-family .h5 frame archives -> one resident (sum_T, H, W)
        array (channel dim squeezed as ``to_nhwc`` does). Window universe
        == H5SequenceLoader: truncate to a multiple of in+out, stride-1
        starts per file."""
        w = in_seq_len + out_seq_len
        chunks, starts, offset = [], [], 0
        for path in _list_video_files(folder):
            data = truncate_to_multiple(np.asarray(load_array(path)), w)
            if len(data) < w:
                continue
            if data.ndim == 4:  # (T, 1, H, W)
                data = data.squeeze(1)
            if crop is not None:
                data = data[:, :crop, :crop]
            chunks.append(np.ascontiguousarray(data, np.float32))
            starts.append(offset + np.arange(len(data) - w + 1))
            offset += len(data)
        if not chunks:
            raise ValueError(f"no usable videos under {folder!r}")
        return cls(np.concatenate(chunks), np.concatenate(starts), w, mesh,
                   file_starts=starts)

    @classmethod
    def from_arai(cls, folder: str, mesh=None, *, time_steps: int = 4,
                  downsample_size: tuple[int, int] = (256, 256)):
        """ARAI/MAI region blocks -> one resident (sum_T, H, W, R) array.

        Window universe == :class:`~extended_gan_tpu.data.streaming.
        AraiLoader` (arai_data_loader.py:14-226 parity): numeric-named
        block files in numeric order, NO truncate-to-multiple (every
        stride-1 window of 2*time_steps frames within a file), top-left
        ``downsample_size`` crop, identity normalization (the ARAI
        preprocessing already scaled values). Blocks are stored
        (T, R, 1, H, W); the channel squeezes away and regions move to the
        trailing axis so the on-device gather yields the trainer's
        (B, H, W, S, V) layout directly, exactly as :meth:`from_kmni`.
        """
        w = 2 * time_steps
        files = sorted(
            (f for f in os.listdir(folder) if f.split(".")[0].isdigit()),
            key=lambda x: int(x.split(".")[0]))
        chunks, starts, offset = [], [], 0
        for fname in files:
            data = np.asarray(load_array(os.path.join(folder, fname)))
            if data.ndim == 5:  # (T, R, 1, H, W)
                data = data.squeeze(2)
            data = data[:, :, : downsample_size[0], : downsample_size[1]]
            if len(data) < w:
                continue
            # (T, R, H, W) -> (T, H, W, R)
            chunks.append(np.ascontiguousarray(
                data.transpose(0, 2, 3, 1), np.float32))
            starts.append(offset + np.arange(len(data) - w + 1))
            offset += len(data)
        if not chunks:
            raise ValueError(f"no usable ARAI blocks under {folder!r}")
        return cls(np.concatenate(chunks), np.concatenate(starts), w, mesh,
                   file_starts=starts)

    @classmethod
    def from_pt_frames(cls, folder: str, mesh=None, *, seq_len: int = 4,
                       crop: int | None = 64):
        """Coastal-sea ``.pt`` frame archives (the top-level
        data_loader.py / cycle_gan family) -> one resident (sum_T, H, W)
        array.

        Window universe == :class:`~extended_gan_tpu.data.streaming.
        CoastalSeaLoader`: NO truncation (the reference's truncation slice
        is an operator-precedence no-op — streaming.py:92-97), every
        stride-1 window of 2*seq_len frames within each file; the (T, 1,
        H, W) channel dim squeezes away exactly as ``to_nhwc`` does on the
        streaming path. Values are stored as-is (the coastal preprocessing
        already normalized them)."""
        w = 2 * seq_len
        chunks, starts, offset = [], [], 0
        for path in _list_video_files(folder):
            data = np.asarray(load_array(path))
            if len(data) < w:
                continue
            if data.ndim == 4:  # (T, 1, H, W)
                data = data.squeeze(1)
            if crop is not None:
                data = data[:, :crop, :crop]
            chunks.append(np.ascontiguousarray(data, np.float32))
            starts.append(offset + np.arange(len(data) - w + 1))
            offset += len(data)
        if not chunks:
            raise ValueError(f"no usable videos under {folder!r}")
        return cls(np.concatenate(chunks), np.concatenate(starts), w, mesh,
                   file_starts=starts)

    # ------------------------------------------------------------- epochs
    def epoch_programs(self, key, k: int, batch: int, *,
                       shuffle: bool = True):
        """All megastep start-index programs for one epoch.

        Returns a (n_programs, K, B) int32 array; the ragged tail is
        padded with ``-1`` (masked inside the program). With ``shuffle``
        the order is a device-side ``jax.random.permutation`` under
        ``key`` — the host never materializes the index array. The
        result is sharded (B over the data axis) when a mesh was given,
        so slicing out ``programs[i]`` hands the megastep a correctly
        placed (K, B) operand with no further transfer.
        """
        per = k * batch
        n_prog = max(1, math.ceil(self.n_windows / per))
        order = (jax.random.permutation(key, self.n_windows) if shuffle
                 else jnp.arange(self.n_windows))
        shuffled = jnp.take(self.starts, order)
        pad = n_prog * per - self.n_windows
        if pad:
            shuffled = jnp.concatenate(
                [shuffled, jnp.full((pad,), -1, jnp.int32)])
        programs = shuffled.reshape(n_prog, k, batch)
        if self._mesh is not None:
            m = self._mesh
            dp = ("dcn", "data") if "dcn" in m.mesh.axis_names else "data"
            programs = jax.device_put(programs, m.sharding(None, None, dp))
        return programs

    def eval_programs(self, k: int, batch: int, *, min_batch: int = 2):
        """Composition-faithful eval index programs: (n_prog, K, B) int32
        plus the total valid-sample count.

        The streaming loaders batch CONSECUTIVE windows of one file (never
        spanning files, within-batch shuffle only), and the eval threshold
        is data-driven PER BATCH (median of uniques,
        train.py:60-61 of the reference) — so batch composition is part of
        the metric contract, not just the window multiset. This builds the
        exact same batches: per file, consecutive chunks of ``batch``
        windows, ragged tails -1-padded, size-< ``min_batch`` batches
        dropped (conv-GAT's streaming ``test()`` skips <=1-sample batches
        — default 2; the dcgan eval keeps every batch because its
        disc-accuracy denominators count BATCHES — pass ``min_batch=1``).
        All per-batch metrics are sums /
        within-batch order-invariant, so the result matches the streaming
        eval REGARDLESS of the loader's file-order or within-batch
        shuffling (KmniLoader "batch" mode).
        """
        rows = []
        total = 0
        for fs in self.file_starts:
            for i in range(0, len(fs), batch):
                chunk = fs[i:i + batch]
                if len(chunk) < min_batch:
                    continue
                row = np.full((batch,), -1, np.int64)
                row[: len(chunk)] = chunk
                rows.append(row)
                total += len(chunk)
        if not rows:
            raise ValueError("no eval batches (every file yields <= 1 "
                             "window at this batch size)")
        n_prog = math.ceil(len(rows) / k)
        pad = n_prog * k - len(rows)
        rows.extend([np.full((batch,), -1, np.int64)] * pad)
        programs = jnp.asarray(
            np.stack(rows).reshape(n_prog, k, batch), jnp.int32)
        if self._mesh is not None:
            m = self._mesh
            dp = ("dcn", "data") if "dcn" in m.mesh.axis_names else "data"
            programs = jax.device_put(programs, m.sharding(None, None, dp))
        return programs, total

    def program_sample_counts(self, n_programs: int, k: int,
                              batch: int) -> list[int]:
        """Valid (unpadded) samples per program — host-side bookkeeping
        for running-loss denominators, no device fetch needed."""
        per = k * batch
        return [min(per, self.n_windows - i * per)
                for i in range(n_programs)]


def _gather_windows(video, st, w, *, frame_axis_to: int):
    """On-device window materialization shared by every resident step/eval:
    validity mask from the -1 padding convention, clamp-gather by start
    index, frame axis moved to ``frame_axis_to`` (3 for the GAT
    (B, H, W, 2S, V) layout, -1 for the frames-as-channels families)."""
    mask = (st >= 0).astype(jnp.float32)
    idx = jnp.maximum(st, 0)[:, None] + jnp.arange(w)
    wins = jnp.moveaxis(video[idx], 1, frame_axis_to)
    return wins, mask


def _aggregate_megastep_logs(stacked):
    # same rule as train/megastep.py::wrap_megastep: (num, denom)
    # accumulators sum exactly over the K steps; scalars keep the last
    return {
        k: jnp.sum(v, axis=0) if k.endswith("_nd") else v[-1]
        for k, v in stacked.items()
    }


def make_gat_resident_megastep(model, tx, *, time_steps: int = 4,
                               remat: bool = False, criterion: str = "mse",
                               moe_aux_weight: float = 0.0):
    """K conv-GAT train steps per XLA program, batches GATHERED ON DEVICE.

    Signature: ``megastep(state, video, starts, rngs)`` with ``video`` the
    resident (sum_T, H, W, V) array (NOT donated — it is the dataset),
    ``starts`` a (K, B) int32 program from
    :meth:`ResidentVideos.epoch_programs` and ``rngs`` (K, 2) dropout keys.
    ``-1`` starts become zero-masked rows: their gather index clamps to 0
    and the step body's masked reductions ignore them — identical
    statistics to the streaming path's zero-padded ragged tail.

    Update math is byte-identical to :func:`make_gat_megastep`'s (the same
    ``_make_gat_step_body``); only the batch source differs, so per-step
    numerics match the streaming megastep fed the same windows
    (tests/test_resident.py).
    """
    from ..train.gat_trainer import _make_gat_step_body

    body = _make_gat_step_body(model, tx, remat=remat, criterion=criterion,
                               moe_aux_weight=moe_aux_weight)
    w = 2 * time_steps

    @functools.partial(jax.jit, donate_argnums=(0,))
    def megastep(state, video, starts, rngs):
        def scan_body(s, inp):
            st, rng = inp
            wins, mask = _gather_windows(video, st, w, frame_axis_to=3)
            s, logs = body(s, wins[..., :time_steps, :],
                           wins[..., time_steps:, :], mask, rng)
            return s, logs

        state, stacked = jax.lax.scan(scan_body, state, (starts, rngs))
        return state, _aggregate_megastep_logs(stacked)

    return megastep


def _median_of_uniques(vals):
    """On-device twin of the reference's data-driven eval threshold
    (convolutional_gat/train.py:60-61): ``unique = np.unique(y); thr =
    unique[int(len(unique) * 0.5)]``. ``np.unique`` has a data-dependent
    output shape, so instead: sort, mark first occurrences, and pick the
    value whose DISTINCT rank is floor(n_unique/2) + 1 — identical result,
    static shapes throughout."""
    u = jnp.sort(vals.reshape(-1))
    isf = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (u[1:] != u[:-1]).astype(jnp.int32)])
    target = jnp.sum(isf) // 2 + 1  # 1-based rank of unique[floor(n/2)]
    ranks = jnp.cumsum(isf)
    return u[jnp.argmax(ranks == target)]


def make_gat_resident_eval(model, *, time_steps: int = 4,
                           power: float = 1.0,
                           normalizing_max: float = 1.0):
    """K eval batches per XLA program over a RESIDENT validation store.

    The streaming eval (gat_trainer.test) pays a host->device batch copy
    plus a threshold-computing host pass per val batch — on a
    relay-attached chip that makes epoch wall-clock EVAL-dominated once
    training goes resident. Here the val split lives in HBM, the
    per-batch median-of-uniques threshold computes on device
    (:func:`_median_of_uniques`), and each program returns ONE (6,)
    metric-sum vector. Padded (-1) rows contribute nothing: their metric
    rows are masked, and the threshold sees row 0's values in their place
    (duplicates never change a unique SET, so the threshold is exactly
    the valid rows').

    Signature: ``eval_k(state, video, starts) -> (6,)`` summing
    [loss_num, denorm_num, acc, prec, rec, n] over the K batches, with
    NaN prec/rec (empty positive sets) counted as 0 exactly like the
    host accumulation in gat_trainer.test.
    """
    from ..train.gat_trainer import _eval_metrics

    w = 2 * time_steps

    @jax.jit
    def eval_k(state, video, starts):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def scan_body(acc, st):
            wins, mask = _gather_windows(video, st, w, frame_axis_to=3)
            x = wins[..., :time_steps, :]
            y = wins[..., time_steps:, :]
            y_hat = model.apply(variables, x, train=False)
            inv = 1.0 / power
            y_p = y ** inv if power != 1.0 else y
            m = mask.reshape((-1,) + (1,) * (y.ndim - 1))
            thr = _median_of_uniques(jnp.where(m > 0, y_p, y_p[0:1]))
            out = _eval_metrics(y_hat, y, mask, thr, normalizing_max,
                                power)
            row = jnp.stack([
                out["loss_num"], out["denorm_num"], out["acc"],
                jnp.nan_to_num(out["prec"]), jnp.nan_to_num(out["rec"]),
                out["n"],
            ])
            return acc + row, None

        acc, _ = jax.lax.scan(scan_body, jnp.zeros((6,), jnp.float32),
                              starts)
        return acc

    return eval_k


def resident_gat_test(eval_k, state, store: ResidentVideos, *,
                      k: int = 8, batch_size: int = 64,
                      flag: str = "val") -> dict:
    """Drop-in for gat_trainer.test over a resident val store: same
    return keys, metric sums fetched once per K-batch program."""
    programs, total = store.eval_programs(k, batch_size)
    sums = np.zeros((6,), np.float64)
    pending = [eval_k(state, store.video, programs[i])
               for i in range(int(programs.shape[0]))]
    for acc in jax.device_get(pending):
        sums += np.asarray(acc, np.float64)
    total = max(total, 1)
    return {
        f"{flag}_loss": float(sums[0]) / total,
        f"{flag}_acc": float(sums[2]) / total,
        f"{flag}_prec": float(sums[3]) / total,
        f"{flag}_rec": float(sums[4]) / total,
        f"{flag}_denorm_mse": float(sums[1]) / total,
    }


def make_dcgan_resident_eval(g_model, fd_model, td_model, *,
                             in_seq_len: int = 4, out_seq_len: int = 4):
    """K dcgan eval batches per XLA program over a resident TEST store.

    The dcgan eval already returns pure (num, denom) accumulators (no
    data-driven threshold — MetricsManager binarizes at 0.5), so the
    resident form is a plain scan over on-device gathers summing the
    three log vectors; ONE small fetch per K batches replaces a
    host->device batch copy + fetch per batch.

    Signature: ``eval_k(states, video, starts) -> logs`` with the same
    keys as ``make_dcgan_eval_step`` summed over the K batches.
    """
    from ..train.dcgan_trainer import make_dcgan_eval_step

    inner = make_dcgan_eval_step(g_model, fd_model, td_model)
    w = in_seq_len + out_seq_len

    @jax.jit
    def eval_k(states, video, starts):
        def batch_logs(st):
            wins, mask = _gather_windows(video, st, w,
                                         frame_axis_to=-1)
            _, logs = inner(states, wins[..., :in_seq_len],
                            wins[..., in_seq_len:], mask)
            # program-padding rows (ALL -1): contribute nothing — the
            # disc-accuracy denominators count 1 per REAL batch
            any_valid = (jnp.sum(mask) > 0).astype(jnp.float32)
            return jax.tree_util.tree_map(lambda v: v * any_valid, logs)

        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(batch_logs, starts[0]))
        acc, _ = jax.lax.scan(
            lambda a, st: (jax.tree_util.tree_map(
                jnp.add, a, batch_logs(st)), None),
            zeros, starts)
        return acc

    return eval_k


def resident_dcgan_test(eval_k, states, store: ResidentVideos, *,
                        k: int = 8, batch_size: int = 64) -> dict:
    """Drop-in for dcgan_trainer.test over a resident test store (same
    result keys; viz is the caller's concern — gather one batch via
    :meth:`ResidentVideos` indices if needed)."""
    from ..utils.metrics import IncrementalTuple, MetricsManager

    programs, _total = store.eval_programs(k, batch_size, min_batch=1)
    pending = [eval_k(states, store.video, programs[i])
               for i in range(int(programs.shape[0]))]
    fd = MetricsManager(("accuracy",), prefix="frame_disc")
    td = MetricsManager(("accuracy",), prefix="temp_disc")
    pred = MetricsManager(("accuracy", "precision", "recall", "mse"),
                          prefix="pred")
    for logs in jax.device_get(pending):
        fd.metrics["accuracy"] += IncrementalTuple(logs["fd_acc_nd"])
        td.metrics["accuracy"] += IncrementalTuple(logs["td_acc_nd"])
        pred.update_from_nd(logs["pred_nd"])
    return fd.results() | td.results() | pred.results()


def make_cyclegan_resident_eval(g_xy_model, g_yx_model, *,
                                seq_len: int = 4):
    """K CycleGAN eval batches per XLA program over a resident TEST store.

    ``make_cyclegan_eval_step``'s logs are already pure masked (num,
    denom) accumulators — a fully-padded program contributes zero to
    both — so the resident form is a plain scan-sum over on-device
    gathers: ONE (2,)-vector pair fetch per K batches replaces a
    host->device batch copy + fetch per batch (the same inversion as
    the conv-GAT/dcgan resident evals).

    Signature: ``eval_k(states, video, starts) -> {pred_mse_nd,
    cycle_l1_nd}`` summed over the K batches.
    """
    from ..train.cyclegan_trainer import make_cyclegan_eval_step

    inner = make_cyclegan_eval_step(g_xy_model, g_yx_model)
    w = 2 * seq_len

    @jax.jit
    def eval_k(states, video, starts):
        def scan_body(acc, st):
            wins, mask = _gather_windows(video, st, w,
                                         frame_axis_to=-1)
            _, logs = inner(states, wins[..., :seq_len],
                            wins[..., seq_len:], mask)
            return (acc[0] + logs["pred_mse_nd"],
                    acc[1] + logs["cycle_l1_nd"]), None

        zeros = (jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.float32))
        acc, _ = jax.lax.scan(scan_body, zeros, starts)
        return {"pred_mse_nd": acc[0], "cycle_l1_nd": acc[1]}

    return eval_k


def resident_cyclegan_test(eval_k, states, store: ResidentVideos, *,
                           k: int = 8, batch_size: int = 64) -> dict:
    """Drop-in for the cyclegan driver's streaming eval loop over a
    resident test store: same result keys, sums fetched once per
    K-batch program."""
    from ..utils.metrics import IncrementalTuple

    # min_batch=1: the cyclegan streaming eval keeps every batch (its
    # metrics are pure masked sums, no per-batch data-driven threshold)
    programs, _ = store.eval_programs(k, batch_size, min_batch=1)
    pred, cyc = IncrementalTuple(), IncrementalTuple()
    pending = [eval_k(states, store.video, programs[i])
               for i in range(int(programs.shape[0]))]
    for logs in jax.device_get(pending):
        pred += IncrementalTuple(logs["pred_mse_nd"])
        cyc += IncrementalTuple(logs["cycle_l1_nd"])
    return {"pred_mse": pred.item(), "cycle_l1": cyc.item()}


def make_cyclegan_resident_megastep(g_xy_model, g_yx_model, d_x_model,
                                    d_y_model, g_xy_tx, g_yx_tx, d_x_tx,
                                    d_y_tx, *, seq_len: int = 4,
                                    cycle_lambda: float = 10.0):
    """K fused CycleGAN steps per program with on-device batch gathers.

    Signature: ``megastep(states, video, starts, rngs)``; ``video`` is
    the resident (sum_T, H, W) coastal frame array from
    :meth:`ResidentVideos.from_pt_frames`. The gather lands directly in
    the trainer's NHWC frames-as-channels layout (x: (B, H, W, seq),
    y: same). Update math == ``make_cyclegan_megastep`` (shared step
    body, tests/test_resident.py).
    """
    from ..train.cyclegan_trainer import _make_cyclegan_step_body

    body = _make_cyclegan_step_body(
        g_xy_model, g_yx_model, d_x_model, d_y_model,
        g_xy_tx, g_yx_tx, d_x_tx, d_y_tx, cycle_lambda=cycle_lambda,
    )
    w = 2 * seq_len

    @functools.partial(jax.jit, donate_argnums=(0,))
    def megastep(states, video, starts, rngs):
        def scan_body(s, inp):
            st, rng = inp
            wins, mask = _gather_windows(video, st, w,
                                         frame_axis_to=-1)
            s, logs = body(s, wins[..., :seq_len], wins[..., seq_len:],
                           mask, rng)
            return s, logs

        states, stacked = jax.lax.scan(scan_body, states, (starts, rngs))
        return states, _aggregate_megastep_logs(stacked)

    return megastep


def make_dcgan_resident_megastep(g_model, fd_model, td_model, g_tx, fd_tx,
                                 td_tx, *, in_seq_len: int = 4,
                                 out_seq_len: int = 4, fused_disc=False,
                                 dedup_g=False, fused_prop=False):
    """K fused adversarial steps per program with on-device batch gathers.

    Signature: ``megastep(states, video, starts, rngs)``; ``video`` is the
    resident (sum_T, H, W) frame array from
    :meth:`ResidentVideos.from_h5`. The gather produces the trainer's
    NHWC frames-as-channels layout (x: (B, H, W, in), y: (B, H, W, out))
    directly. Update math == ``make_dcgan_megastep`` (shared step body).
    """
    from ..train.dcgan_trainer import _make_dcgan_step_body

    body = _make_dcgan_step_body(
        g_model, fd_model, td_model, g_tx, fd_tx, td_tx,
        fused_disc=fused_disc, dedup_g=dedup_g, fused_prop=fused_prop,
    )
    w = in_seq_len + out_seq_len

    @functools.partial(jax.jit, donate_argnums=(0,))
    def megastep(states, video, starts, rngs):
        def scan_body(s, inp):
            st, rng = inp
            wins, mask = _gather_windows(video, st, w,
                                         frame_axis_to=-1)
            s, logs = body(s, wins[..., :in_seq_len],
                           wins[..., in_seq_len:], mask, rng)
            return s, logs

        states, stacked = jax.lax.scan(scan_body, states, (starts, rngs))
        return states, _aggregate_megastep_logs(stacked)

    return megastep
