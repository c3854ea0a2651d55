"""Attribute the disk-backed megafeed's wall-clock: host build vs
host->device bulk transfer vs device compute.

Round-4 context: the megafeed path (K=64 batches per staged transfer +
one program) measured only ~11-15 steps/s on the relay rig, barely above
the single-step feed, while the device-RESIDENT path hits ~240-400. This
probe separates the three walls for one K=64 dcgan group so BENCH_NOTES
can carry a measured attribution instead of a guess:

  1. host build  — loader iteration + window materialization + np.stack,
  2. transfer    — put_megabatch of the staged (K, B, ...) arrays, timed
                   to data-on-device (scalar readback of a device sum),
  3. device      — the megastep on pre-staged operands (true, drained).

Run: python scripts/probe_pipeline_walls.py   (real chip)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main(K=64, batch=32):
    import jax

    from extended_gan_tpu.data.streaming import get_h5_loaders
    from extended_gan_tpu.data.synthetic import ensure_synthetic_h5
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import (
        make_dcgan_megastep,
        to_nhwc,
    )

    mesh = MeshContext.create(data=1, model=1)
    models, txs, states, _ = build_dcgan(dict(DEFAULT_PARAMS), seed=0)
    states = mesh.put_replicated(states)
    mega = make_dcgan_megastep(*models, *txs)

    frames = batch * (2 * K + 2) + 16
    data_dir = ensure_synthetic_h5(None, frames_train=frames,
                                   frames_test=16, h=64, w=64)

    def build_group(loader_seed):
        loader, _ = get_h5_loaders(data_dir, batch, batch, crop=64,
                                   in_seq_len=4, out_seq_len=4,
                                   seed=loader_seed)
        xs, ys = [], []
        it = iter(loader)
        for _ in range(K):
            x, y = next(it)
            xs.append(to_nhwc(x))
            ys.append(to_nhwc(y))
        return np.stack(xs), np.stack(ys), np.ones((K, batch), np.float32)

    # --- 1. host build (second loader seed: cold page cache effects shared)
    build_group(1)  # warm file cache
    t0 = time.perf_counter()
    xs, ys, ms = build_group(2)
    t_build = time.perf_counter() - t0
    nbytes = xs.nbytes + ys.nbytes + ms.nbytes

    # --- 2. transfer (to data-on-device: scalar readback forces residency)
    def put_and_land(a, b, c):
        xd, yd, md = mesh.put_megabatch(a, b, c)
        s = jax.jit(lambda u: u[0, 0].sum())(xd)
        np.asarray(s)  # device_get: cannot complete before the transfer
        return xd, yd, md

    put_and_land(xs, ys, ms)  # warm: compile the landing probe
    t0 = time.perf_counter()
    xd, yd, md = put_and_land(xs, ys, ms)
    t_xfer = time.perf_counter() - t0

    # --- 3. device compute on pre-staged operands (drained)
    rngs = jax.random.split(jax.random.PRNGKey(0), K)
    states, logs = mega(states, xd, yd, md, rngs)  # warm compile
    np.asarray(jax.tree_util.tree_leaves(logs)[0])
    t0 = time.perf_counter()
    states, logs = mega(states, xd, yd, md, rngs)
    np.asarray(jax.tree_util.tree_leaves(logs)[0])
    t_dev = time.perf_counter() - t0

    total = t_build + t_xfer + t_dev
    print(f"K={K} b={batch} staged bytes: {nbytes / 1e6:.0f} MB")
    print(f"host build : {t_build:.2f} s  ({t_build / total:.0%})")
    print(f"transfer   : {t_xfer:.2f} s  ({t_xfer / total:.0%})  "
          f"=> {nbytes / t_xfer / 1e6:.0f} MB/s effective link bandwidth")
    print(f"device     : {t_dev:.2f} s  ({t_dev / total:.0%})")
    print(f"serial steps/s bound: {K / total:.1f} "
          f"(observed megafeed leg ~11)")
    print(f"transfer-only bound : {K / t_xfer:.1f} steps/s")


if __name__ == "__main__":
    main()
