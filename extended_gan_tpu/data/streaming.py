"""File-streaming batch loaders.

Capability clones of the reference's four custom ``DataLoader`` iterator
families, with identical epoch statistics (file-at-a-time streaming, window
construction, remainder handling, within-batch shuffling):

- :class:`CoastalSeaLoader`  == /root/reference/data_loader.py:7-98 and the
  cycle_gan copy (.pt files, 2*seq_len windows),
- :class:`H5SequenceLoader`  == /root/reference/dcgan/data_loader.py:9-120
  (.h5 files, in+out windows built per batch),
- :class:`KmniLoader`        == kmni_data_loader.py:16-167 (.pt videos,
  8-frame windows -> 4-in/4-out, /254 + power normalization, optional
  2x3 node mosaic, (B, H, W, T, V) layout),
- :class:`AraiLoader`        == arai_data_loader.py:14-226 (.pt region
  blocks, background-thread prefetch, metadata.json lengths).

Differences from the reference are host-side performance only: windows are
stride-tricks views (zero copy), shuffling uses a seeded numpy Generator
instead of global torch state, and batches stay numpy — device transfer is
the trainer's job (sharded ``device_put`` via MeshContext, overlapped by
:class:`Prefetcher`).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Iterator

import numpy as np

from .io import load_array
from .windowing import sliding_windows, truncate_to_multiple


def _list_files(folder: str, rng: np.random.Generator | None):
    files = [os.path.join(folder, fn) for fn in sorted(os.listdir(folder))]
    files = [f for f in files if not f.endswith((".json", ".md"))]
    if rng is not None:
        files = [files[i] for i in rng.permutation(len(files))]
    return tuple(files)


class _FileStream:
    """Shared file-at-a-time streaming core (reference __read_next_file)."""

    def __init__(self, folder: str, *, shuffle: bool, seed: int):
        self.folder = folder
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.files = _list_files(folder, self._rng if shuffle else None)
        self.file_index = 0

    def read_next_file(self) -> np.ndarray:
        if self.file_index == len(self.files):
            raise StopIteration
        data = load_array(self.files[self.file_index])
        self.file_index += 1
        return np.asarray(data)

    def perm(self, n: int) -> np.ndarray:
        return self._rng.permutation(n) if self.shuffle else np.arange(n)


class CoastalSeaLoader(_FileStream):
    """.pt frame streamer: 2*seq_len sliding windows, crop, (x, y) halves.

    Yields (x, y) float32 arrays of shape (b, seq_len, C, H, W).
    """

    def __init__(
        self,
        folder: str,
        batch_size: int,
        device=None,  # accepted for API parity; transfer happens downstream
        *,
        crop: int | None = 64,
        shuffle: bool = True,
        seq_len: int = 4,
        seed: int = 369,
    ):
        super().__init__(folder, shuffle=shuffle, seed=seed)
        self.batch_size = batch_size
        self.crop = crop
        self.seq_len = seq_len
        self.device = device
        self.remainder = self._segmentify(self.read_next_file())
        self.file_length = self.remainder.shape[0] * self.remainder.shape[1]

    def _segmentify(self, data: np.ndarray) -> np.ndarray:
        # NOTE: the reference's truncation slice (data_loader.py:45,
        # `data[: (len//2*seq_len) * 2*seq_len]`) is an operator-precedence
        # no-op — the bound always exceeds len — so the effective behavior
        # is NO truncation: every stride-1 window of the full file is used.
        # We reproduce the effective behavior.
        if self.crop is not None:
            data = data[:, :, : self.crop, : self.crop]
        return sliding_windows(data, 2 * self.seq_len)

    def __next__(self):
        data = self.remainder
        while data.shape[0] == 0:
            # a file too short for one window contributes nothing — keep
            # reading instead of ending the epoch (read_next_file raises
            # StopIteration once the folder is exhausted)
            data = self._segmentify(self.read_next_file())
        self.remainder = data[self.batch_size :]
        result = data[: self.batch_size]
        idx = self.perm(result.shape[0])
        x = result[idx, : self.seq_len].astype(np.float32)
        y = result[idx, self.seq_len :].astype(np.float32)
        return x, y

    def __iter__(self):
        return self


class H5SequenceLoader(_FileStream):
    """dcgan-style .h5 streamer.

    Window construction matches dcgan/data_loader.py:58-85: each batch
    takes the ``batch_size`` length-(in+out) windows starting at offsets
    0..batch_size-1 of the current buffer, then drops batch_size frames.
    Yields (x, y) of shapes (b, in_seq, C, H, W) / (b, out_seq, C, H, W).
    """

    def __init__(
        self,
        folder: str,
        batch_size: int,
        device=None,
        *,
        crop: int | None = 64,
        shuffle: bool = True,
        in_seq_len: int = 4,
        out_seq_len: int = 4,
        seed: int = 369,
    ):
        super().__init__(folder, shuffle=shuffle, seed=seed)
        self.batch_size = batch_size
        self.crop = crop
        self.in_seq_len = in_seq_len
        self.out_seq_len = out_seq_len
        self.tot_seq_len = in_seq_len + out_seq_len
        self.device = device
        self.remainder = self._segmentify(self.read_next_file())
        self.file_length = self.remainder.shape[0] * self.remainder.shape[1]

    def _segmentify(self, data: np.ndarray) -> np.ndarray:
        data = truncate_to_multiple(data, self.tot_seq_len)
        if self.crop is not None:
            data = data[:, :, : self.crop, : self.crop]
        return data

    def __next__(self):
        data = self.remainder
        while True:
            windows = (
                sliding_windows(data, self.tot_seq_len)[: self.batch_size]
                if len(data)
                else data
            )
            if len(windows):
                break
            # buffer empty or too short for one window: replace it with the
            # next file (the reference re-reads on a short buffer too,
            # dcgan/data_loader.py:58-63); StopIteration propagates from
            # read_next_file only when the folder is exhausted
            data = self._segmentify(self.read_next_file())
        self.remainder = data[self.batch_size :]
        idx = self.perm(windows.shape[0])
        x = windows[idx, : self.in_seq_len].astype(np.float32)
        y = windows[idx, self.in_seq_len :].astype(np.float32)
        return x, y

    def __iter__(self):
        return self


class KmniLoader(_FileStream):
    """KNMI radar video streamer -> (B, H, W, T=4, V) batches.

    Normalization: value/254 then ``** power`` (kmni_data_loader.py:32,77-78).
    ``merge_nodes`` reproduces the reference's overlapping 2x3 mosaic
    (:96-106). Exposes ``.power`` and ``.normalizing_max`` for the eval-time
    de-normalization in the trainer (convolutional_gat/train.py:54-73).
    """

    def __init__(
        self,
        batch_size: int,
        folder: str,
        device=None,
        *,
        time_steps: int = 4,
        crop: int | None = None,
        shuffle: bool = True,
        merge_nodes: bool = False,
        power: float = 1.0,
        seed: int = 369,
        use_native: bool = True,
        shuffle_mode: str = "batch",
        shuffle_pool: int = 4,
    ):
        """shuffle_mode:

        - "batch" (reference semantics, kmni_data_loader.py:116-118):
          batches are consecutive windows of one file, shuffled only
          WITHIN the batch — nearly sequential data order.
        - "global": a locality-aware permutation over every (file, window)
          pair: file order is shuffled, files are grouped into pools of
          ``shuffle_pool``, and windows shuffle freely WITHIN each pool.
          Each file therefore decodes exactly once per epoch (the decode
          cache holds one pool), instead of thrashing under a fully random
          order. ``shuffle_pool=0`` = one pool = the fully random order.
          Better SGD mixing than "batch"; opt-in because it changes epoch
          ordering (not the sample multiset) vs the reference.
        """
        super().__init__(folder, shuffle=shuffle, seed=seed)
        self.batch_size = batch_size
        self.time_steps = time_steps
        self.crop = crop
        self.merge_nodes = merge_nodes
        self.power = power
        self.normalizing_max = 254.0
        self.device = device
        self.data_folder = folder
        self.shuffle_mode = shuffle_mode
        self.shuffle_pool = shuffle_pool
        if shuffle_mode == "global":
            self._init_global()
            self.use_native = True
            self.file_length = 2 * len(self._order)
            return
        if shuffle_mode != "batch":
            raise ValueError(f"unknown shuffle_mode {shuffle_mode!r}")
        # Native fast path: raw video + window starts; batches (mosaic
        # included) are materialized by the C++ core (data/native.py) with
        # gather/normalize/layout fused. Falls back transparently.
        self.use_native = use_native
        if self.use_native:
            self._video: np.ndarray | None = None
            self._starts = np.empty((0,), np.int64)
            self._advance_file()
            # parity with the python path / reference
            # (kmni_data_loader.py:48: remainder.shape[0] * shape[1] = 2*n)
            self.file_length = 2 * len(self._starts)
        else:
            self.remainder = self._segmentify(self.read_next_file())
            self.file_length = (
                self.remainder.shape[0] * self.remainder.shape[1]
            )

    def _advance_file(self):
        w = 2 * self.time_steps
        data = truncate_to_multiple(self.read_next_file(), w)
        self._video = np.ascontiguousarray(data, np.float32)
        n_windows = max(len(self._video) - w + 1, 0)
        self._starts = np.arange(n_windows, dtype=np.int64)

    # ----------------------------------------------------- global shuffle
    def _init_global(self):
        from .io import array_n_frames

        w = 2 * self.time_steps
        # header-only window counts — O(files) construction, no decode
        counts = []
        for path in self.files:
            usable = (array_n_frames(path) // w) * w
            counts.append(max(usable - w + 1, 0))
        file_ids = np.arange(len(self.files))
        if self.shuffle:
            file_ids = self._rng.permutation(file_ids)
        pool = max(int(self.shuffle_pool), 0) or len(self.files) or 1
        chunks = []
        for i in range(0, len(file_ids), pool):
            ids = np.asarray(file_ids[i : i + pool], np.int64)
            cnts = np.asarray([counts[fi] for fi in ids], np.int64)
            # vectorized (fi, start) pairs: the tuple-list version built
            # one Python tuple per window — gigabytes of transients at
            # archive scale when shuffle_pool=0 makes one giant pool
            block = np.stack(
                [
                    np.repeat(ids, cnts),
                    np.concatenate(
                        [np.arange(c, dtype=np.int64) for c in cnts]
                    ) if len(cnts) else np.empty(0, np.int64),
                ],
                axis=1,
            )
            if self.shuffle and len(block):
                block = block[self._rng.permutation(len(block))]
            chunks.append(block)
        self._order = (
            np.concatenate(chunks) if chunks else np.empty((0, 2), np.int64)
        )
        self._cursor = 0
        self._pool_size = pool
        self._video_cache: dict = {}
        self.n_decodes = 0  # observability: decodes per epoch == n_files

    # Hard memory ceiling on decoded videos held at once. Pooled mode never
    # needs more than 2 pools; fully-random mode (shuffle_pool=0 => pool ==
    # n_files) would otherwise cache the ENTIRE decoded archive — there the
    # cap trades re-decodes for bounded host RAM.
    MAX_CACHED_VIDEOS = 16

    def _load_video(self, fi: int) -> np.ndarray:
        if fi not in self._video_cache:
            # LRU sized to TWO pools: a batch can straddle one pool
            # boundary, so files of pools k and k+1 may be live at once;
            # with capacity 2*pool each file decodes exactly once per epoch
            cap = min(max(2 * self._pool_size, 2), self.MAX_CACHED_VIDEOS)
            while len(self._video_cache) >= cap:
                self._video_cache.pop(next(iter(self._video_cache)))
            data = truncate_to_multiple(
                np.asarray(load_array(self.files[fi])), 2 * self.time_steps
            )
            self._video_cache[fi] = np.ascontiguousarray(data, np.float32)
            self.n_decodes += 1
        return self._video_cache[fi]

    def _next_global(self):
        from .native import kmni_make_batch, kmni_make_batch_merged

        if self._cursor >= len(self._order):
            raise StopIteration
        batch = self._order[self._cursor : self._cursor + self.batch_size]
        self._cursor += len(batch)
        make = (
            kmni_make_batch_merged if self.merge_nodes else kmni_make_batch
        )
        xs, ys = [], []
        for fi in np.unique(batch[:, 0]):
            starts = batch[batch[:, 0] == fi, 1]
            x, y = make(
                self._load_video(int(fi)), starts, steps=self.time_steps,
                crop=self.crop, max_value=self.normalizing_max,
                power=self.power,
            )
            xs.append(x)
            ys.append(y)
        return np.concatenate(xs), np.concatenate(ys)

    def _segmentify(self, data: np.ndarray) -> np.ndarray:
        w = 2 * self.time_steps
        data = truncate_to_multiple(data, w)
        data = (data.astype(np.float32) / self.normalizing_max) ** self.power
        segments = sliding_windows(data, w)  # (n, 8, V, H, W)
        if segments.shape[0] == 0:
            # rank must match the real (2, n, T, V, H, W) output — a 5-D
            # sentinel crashed __next__'s 6-axis transpose on short files
            return np.empty(
                (2, 0, self.time_steps) + segments.shape[2:], np.float32
            )
        # (n, 2, 4, V, H, W) -> (2, n, 4, V, H, W)
        split = np.stack(
            [segments[:, : self.time_steps], segments[:, self.time_steps :]],
            axis=1,
        ).swapaxes(0, 1)
        if self.crop is not None:
            split = split[:, :, :, :, : self.crop, : self.crop]
        if self.merge_nodes:
            # overlapping vertex pairs (0,1),(1,2),(2,3) tiled 2 high x 3 wide
            split = np.concatenate(
                [
                    np.concatenate(
                        (split[:, :, :, i], split[:, :, :, i + 1]), axis=3
                    )
                    for i in range(3)
                ],
                axis=4,
            )
        return split

    def __next__(self):
        if self.shuffle_mode == "global":
            return self._next_global()
        if self.use_native:
            return self._next_native()
        data = self.remainder
        while data.shape[1] == 0:
            # short files yield zero windows — skip them, don't end the epoch
            data = self._segmentify(self.read_next_file())
        self.remainder = data[:, self.batch_size :]
        result = data[:, : self.batch_size]
        idx = self.perm(result.shape[1])
        if not self.merge_nodes:
            # (2, b, T, V, H, W) -> (2, b, H, W, T, V)
            result = result.transpose(0, 1, 4, 5, 2, 3)
        return np.ascontiguousarray(result[0][idx]), np.ascontiguousarray(
            result[1][idx]
        )

    def _next_native(self):
        from .native import kmni_make_batch, kmni_make_batch_merged

        while len(self._starts) == 0:
            self._advance_file()  # raises StopIteration at end of files
        batch_starts = self._starts[: self.batch_size]
        self._starts = self._starts[self.batch_size :]
        idx = self.perm(len(batch_starts))
        make = (
            kmni_make_batch_merged if self.merge_nodes else kmni_make_batch
        )
        x, y = make(
            self._video,
            batch_starts[idx],
            steps=self.time_steps,
            crop=self.crop,
            max_value=self.normalizing_max,
            power=self.power,
        )
        return x, y

    def __iter__(self):
        return self


class AraiLoader:
    """ARAI/MAI region-block streamer with background-thread prefetch.

    Parity with arai_data_loader.py:14-226: metadata-driven length, stride-1
    2T windows per file, (B, H, W, T, V) output. The prefetch thread here
    uses a bounded queue (depth 2) instead of the reference's single-slot
    join/restart dance — same overlap, no lost-wakeup races.
    """

    def __init__(
        self,
        batch_size: int,
        folder: str,
        device=None,
        *,
        total_length: int,
        n_regions: int = 5,
        time_steps: int = 4,
        downsample_size: tuple[int, int] = (256, 256),
        use_native: bool = True,
        shuffle: bool = False,
        seed: int = 369,
    ):
        self.batch_size = batch_size
        self.folder = folder
        self.device = device
        self.total_length = total_length
        self.n_regions = n_regions
        self.time_steps = time_steps
        self.downsample_size = downsample_size
        self.use_native = use_native
        self.power = 1.0
        self.normalizing_max = 1.0
        # numeric block files only — a stray .DS_Store/README must not
        # crash construction
        self.files = sorted(
            (f for f in os.listdir(folder) if f.split(".")[0].isdigit()),
            key=lambda x: int(x.split(".")[0]),
        )
        if shuffle:
            # file-order shuffle (windows stay sequential within a block —
            # batches never span files anyway); seed+epoch upstream gives
            # each epoch a fresh order
            rng = np.random.default_rng(seed)
            self.files = [self.files[i]
                          for i in rng.permutation(len(self.files))]
        self._queue: queue.Queue = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def __len__(self):
        """Exact batch count: per file ceil((frames - 2T + 1)/batch) —
        batches do not span files and the last one per file is partial.
        Header-only frame counts; computed lazily and cached."""
        if not hasattr(self, "_len"):
            from .io import array_n_frames

            w = 2 * self.time_steps
            total = 0
            for fname in self.files:
                n = array_n_frames(os.path.join(self.folder, fname))
                nw = max(n - w + 1, 0)
                total += -(-nw // self.batch_size)
            self._len = total
        return self._len

    def _produce_native(self, data: np.ndarray):
        """(N, R, 1, H, W) block -> batches via the fused C++ gather: the
        same (frames, regions, H, W) -> (B, H, W, T, R) transform the KNMI
        kernel does (normalization is identity here), GIL-free in this
        producer thread."""
        from .native import kmni_make_batch

        video = np.ascontiguousarray(
            np.asarray(data).squeeze(2), np.float32
        )  # (N, R, H, W)
        n_windows = max(len(video) - 2 * self.time_steps + 1, 0)
        for i in range(0, n_windows, self.batch_size):
            starts = np.arange(
                i, min(i + self.batch_size, n_windows), dtype=np.int64
            )
            x, y = kmni_make_batch(
                video, starts, steps=self.time_steps,
                crop=tuple(self.downsample_size), max_value=1.0, power=1.0,
            )
            self._queue.put((x, y))

    def _produce_numpy(self, data: np.ndarray):
        data = data[
            :, :, :, : self.downsample_size[0], : self.downsample_size[1]
        ]
        windows = sliding_windows(data, 2 * self.time_steps)
        for i in range(0, len(windows), self.batch_size):
            chunk = windows[i : i + self.batch_size]
            self._queue.put(
                (self._fix_sizes(chunk[:, : self.time_steps]),
                 self._fix_sizes(chunk[:, self.time_steps :]))
            )

    def _producer(self):
        try:
            for fname in self.files:
                data = load_array(os.path.join(self.folder, fname))
                # NOTE: like the reference (arai_data_loader.py:159-176 —
                # its cross-file accumulator is commented out), batches do
                # not span file boundaries.
                if self.use_native:
                    self._produce_native(data)
                else:
                    self._produce_numpy(data)
        except BaseException as e:  # surface loader errors to the consumer
            self._queue.put(e)
            return
        finally:
            self._queue.put(None)

    @staticmethod
    def _fix_sizes(a: np.ndarray) -> np.ndarray:
        # (b, T, R, C=1, H, W) -> squeeze channel -> (b, H, W, T, R)
        a = a.squeeze(3)
        return np.ascontiguousarray(a.transpose(0, 3, 4, 1, 2).astype(np.float32))

    def __next__(self):
        item = self._queue.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def __iter__(self):
        return self


class Prefetcher:
    """Depth-N background prefetch of any (x, y) iterator, optionally doing
    the sharded device transfer off the training thread so host IO overlaps
    device compute (the async-input-pipeline role torch DataLoader workers
    play in the reference's world).

    ``threaded`` controls whether a background thread is used at all.
    Default (None) auto-selects by core count: with <= 2 cores there is
    no spare core for the prefetch thread — the device runtime's own
    background threads (RPC completion handling on a remote-attached
    chip) already compete for the CPU, and the thread's GIL ping-pong
    measured 3-4x SLOWER than plain inline iteration (BENCH_NOTES round
    3, pipeline section) — so the Prefetcher degenerates to a
    synchronous iterator applying ``transfer`` inline. Semantics
    (ordering, error propagation, StopIteration) are identical either
    way.
    """

    def __init__(self, it: Iterator, depth: int = 2, transfer=None,
                 threaded: bool | None = None):
        if threaded is None:
            threaded = (os.cpu_count() or 1) > 2
        self._transfer = transfer
        self._threaded = threaded
        if not threaded:
            self._it = it
            return
        self._q: queue.Queue = queue.Queue(maxsize=depth)

        def run():
            try:
                for item in it:
                    if self._transfer is not None:
                        item = self._transfer(item)
                    self._q.put(item)
            except BaseException as e:  # propagate to consumer
                self._q.put(e)
                return
            finally:
                self._q.put(None)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        if not self._threaded:
            item = next(self._it)  # StopIteration propagates
            if self._transfer is not None:
                item = self._transfer(item)
            return item
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


# --------------------------------------------------------------------------
# get_loaders factories (reference API parity)
# --------------------------------------------------------------------------
def get_coastal_loaders(
    data_location: str,
    train_batch_size: int,
    test_batch_size: int,
    device=None,
    *,
    seq_len: int = 4,
    crop: int | None = 64,
    seed: int = 369,
):
    """== /root/reference/data_loader.py:85-98."""
    return (
        CoastalSeaLoader(
            os.path.join(data_location, "train"), train_batch_size, device,
            seq_len=seq_len, crop=crop, seed=seed,
        ),
        CoastalSeaLoader(
            os.path.join(data_location, "test"), test_batch_size, device,
            seq_len=seq_len, crop=crop, seed=seed + 1,
        ),
    )


def get_h5_loaders(
    data_location: str,
    train_batch_size: int,
    test_batch_size: int,
    device=None,
    *,
    crop: int | None = 64,
    in_seq_len: int = 12,
    out_seq_len: int = 6,
    seed: int = 369,
):
    """== /root/reference/dcgan/data_loader.py:91-120."""
    return (
        H5SequenceLoader(
            os.path.join(data_location, "train"), train_batch_size, device,
            crop=crop, in_seq_len=in_seq_len, out_seq_len=out_seq_len,
            seed=seed,
        ),
        H5SequenceLoader(
            os.path.join(data_location, "test"), test_batch_size, device,
            crop=crop, in_seq_len=in_seq_len, out_seq_len=out_seq_len,
            seed=seed + 1,
        ),
    )


def get_kmni_loaders(
    train_batch_size: int,
    test_batch_size: int,
    data_folder: str,
    device=None,
    *,
    crop: int | None = None,
    shuffle: bool = True,
    merge_nodes: bool = False,
    seed: int = 369,
    shuffle_mode: str = "batch",
):
    """== kmni_data_loader.py:133-167 (note: val loader IS the test split,
    reproduced faithfully)."""
    mk = lambda bs, sub, s: KmniLoader(
        bs, os.path.join(data_folder, sub), device,
        crop=crop, shuffle=shuffle, merge_nodes=merge_nodes, seed=s,
        shuffle_mode=shuffle_mode,
    )
    return (
        mk(train_batch_size, "train", seed),
        mk(test_batch_size, "test", seed + 1),
        mk(test_batch_size, "test", seed + 2),
    )


def get_arai_loaders(
    train_batch_size: int,
    test_batch_size: int,
    preprocessed_folder: str,
    device=None,
    *,
    downsample_size: tuple[int, int] = (256, 256),
    shuffle: bool = False,
    seed: int = 369,
):
    """== arai_data_loader.py:190-226 (+ seeded train file-order shuffle)."""
    with open(os.path.join(preprocessed_folder, "metadata.json")) as f:
        metadata = json.load(f)
    mk = lambda bs, sub, sh: AraiLoader(
        bs, os.path.join(preprocessed_folder, sub), device,
        total_length=metadata[sub]["length"],
        n_regions=metadata["n_regions"],
        downsample_size=downsample_size,
        shuffle=sh, seed=seed,
    )
    return (
        mk(train_batch_size, "training", shuffle),
        mk(test_batch_size, "validation", False),
        mk(test_batch_size, "validation", False),
    )


def get_loaders(
    train_batch_size: int,
    test_batch_size: int,
    preprocessed_folder: str,
    device=None,
    *,
    dataset: str = "kmni",
    downsample_size: tuple[int, int] = (256, 256),
    merge_nodes: bool = False,
    shuffle: bool = True,
    seed: int = 369,
    shuffle_mode: str = "batch",
):
    """Dataset dispatcher == convolutional_gat/data_loaders/get_loaders.py:7-35,
    extended with the "synthetic" dataset (generated on the fly, for
    zero-egress demos/benches/tests) and the "global" shuffle_mode."""
    if dataset == "arai":
        return get_arai_loaders(
            train_batch_size, test_batch_size, preprocessed_folder, device,
            downsample_size=downsample_size, shuffle=shuffle, seed=seed,
        )
    if dataset == "kmni":
        return get_kmni_loaders(
            train_batch_size, test_batch_size, preprocessed_folder, device,
            crop=downsample_size[0], merge_nodes=merge_nodes, shuffle=shuffle,
            seed=seed, shuffle_mode=shuffle_mode,
        )
    if dataset == "synthetic":
        from .synthetic import ensure_synthetic_kmni

        folder = ensure_synthetic_kmni(preprocessed_folder or None)
        return get_kmni_loaders(
            train_batch_size, test_batch_size, folder, device,
            crop=downsample_size[0], merge_nodes=merge_nodes, shuffle=shuffle,
            seed=seed, shuffle_mode=shuffle_mode,
        )
    raise ValueError(f"unknown dataset {dataset!r}")
