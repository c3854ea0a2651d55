"""Probe: megastep true rates at bf16 (and K=64) — the device-step lever.

The K-fit (BENCH_NOTES "Second correction") measured the f32 b32 device
step at ~2.7 ms -> the single-chip f32 megastep plateau is ~350 steps/s
regardless of K. bf16 runs the MXU single-pass (4x the f32 multi-pass
rate) and is parity-proven within 1% per-epoch MSE
(scripts/bench_bf16_parity.py), so it is the shipped path to push the
plateau. This probe measures dcgan + conv-GAT megasteps at
(f32, bf16) x K in {16, 64}, plus a K-fit per precision.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def drain(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def time_mega(mega, states, margs, K, rng_pool, n_programs=10):
    states, logs = mega(states, *margs, rng_pool[0])
    drain(logs)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_programs):
            states, logs = mega(states, *margs, rng_pool[i % len(rng_pool)])
        drain(logs)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best * 1e3 / n_programs  # ms/program


def bench_dcgan(precision, K, batch=32):
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS, build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_megastep

    mesh = MeshContext.create(data=1, model=1)
    models, txs, states, _ = build_dcgan(
        dict(DEFAULT_PARAMS), precision=precision, seed=0)
    states = mesh.put_replicated(states)
    mega = make_dcgan_megastep(*models, *txs)
    rng = np.random.RandomState(0)
    xs = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
    ys = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
    ms = np.ones((K, batch), np.float32)
    margs = mesh.put_megabatch(xs, ys, ms)
    key = jax.random.PRNGKey(123)
    pool = [jax.device_put(jax.random.split(jax.random.fold_in(key, i), K))
            for i in range(8)]
    for r in pool:
        r.block_until_ready()
    return time_mega(mega, states, margs, K, pool)


def bench_gat(precision, K, batch=32, hw=20):
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.gat_trainer import make_gat_megastep
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    mesh = MeshContext.create(data=1, model=1)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    model = build_model("temporal", image_width=hw, image_height=hw,
                        n_vertices=6, mapping_type="conv", dtype=dtype)
    tx = adam(1e-3, weight_decay=0.01)
    state = create_net_state(model, tx, KeySeq(0).next(),
                             jnp.zeros((2, hw, hw, 4, 6)))
    state = mesh.put_replicated(state)
    mega = make_gat_megastep(model, tx)
    rng = np.random.RandomState(0)
    xs = rng.rand(K, batch, hw, hw, 4, 6).astype(np.float32)
    ys = rng.rand(K, batch, hw, hw, 4, 6).astype(np.float32)
    ms = np.ones((K, batch), np.float32)
    margs = mesh.put_megabatch(xs, ys, ms)
    key = jax.random.PRNGKey(7)
    pool = [jax.device_put(jax.random.split(jax.random.fold_in(key, i), K))
            for i in range(8)]
    for r in pool:
        r.block_until_ready()
    return time_mega(mega, state, margs, K, pool)


def main():
    for name, fn in (("dcgan", bench_dcgan), ("conv_gat", bench_gat)):
        for precision in ("f32", "bf16"):
            t = {}
            for K in (8, 16, 64):
                t[K] = fn(precision, K)
                print(f"{name} {precision} K={K}: {t[K]:.1f} ms/program "
                      f"-> {K * 1e3 / t[K]:.1f} steps/s", flush=True)
            dev = (t[16] - t[8]) / 8.0
            print(f"{name} {precision} K-fit: device {dev:.3f} ms/step, "
                  f"overhead {t[8] - 8 * dev:.1f} ms/program", flush=True)


if __name__ == "__main__":
    main()
