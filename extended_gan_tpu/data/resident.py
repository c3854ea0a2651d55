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
                 normalizing_max: float = 1.0):
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
                   power=power, normalizing_max=max_value)

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
        return cls(np.concatenate(chunks), np.concatenate(starts), w, mesh)

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

    def program_sample_counts(self, n_programs: int, k: int,
                              batch: int) -> list[int]:
        """Valid (unpadded) samples per program — host-side bookkeeping
        for running-loss denominators, no device fetch needed."""
        per = k * batch
        return [min(per, self.n_windows - i * per)
                for i in range(n_programs)]


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
            mask = (st >= 0).astype(jnp.float32)
            idx = jnp.maximum(st, 0)[:, None] + jnp.arange(w)
            wins = jnp.moveaxis(video[idx], 1, 3)  # (B, H, W, 2S, V)
            s, logs = body(s, wins[..., :time_steps, :],
                           wins[..., time_steps:, :], mask, rng)
            return s, logs

        state, stacked = jax.lax.scan(scan_body, state, (starts, rngs))
        return state, _aggregate_megastep_logs(stacked)

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
            mask = (st >= 0).astype(jnp.float32)
            idx = jnp.maximum(st, 0)[:, None] + jnp.arange(w)
            wins = jnp.moveaxis(video[idx], 1, -1)  # (B, H, W, in+out)
            s, logs = body(s, wins[..., :in_seq_len],
                           wins[..., in_seq_len:], mask, rng)
            return s, logs

        states, stacked = jax.lax.scan(scan_body, states, (starts, rngs))
        return states, _aggregate_megastep_logs(stacked)

    return megastep
