"""Decompose the megastep's true-rate gap (round-3 investigation).

BENCH_r03 showed megastep-K16 at ~267 steps/s while the two-point device
decomposition predicts ~1081 steps/s of pure device compute. Candidates:
(a) per-call host key-gen (`jax.random.split` = 2 extra tiny programs
through the relay per megastep call), (b) the drain's device_get RTT
amortized over too few programs per trial, (c) the scanned carry being
genuinely slower per step on device.

This probe separates them: device-resident pre-generated rng batches
(no per-call programs), a drain-RTT measurement, and a grid over
(K, programs-per-trial).
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


def measure_drain_rtt(n=8):
    one = jax.jit(lambda x: x + 1)(jax.numpy.zeros(()))
    drain(one)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        one = jax.jit(lambda x: x + 1)(one)
        drain(one)
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_megastep

    rtt_best, rtt_med = measure_drain_rtt()
    print(f"tiny program+drain RTT: best {rtt_best*1e3:.1f} ms, "
          f"median {rtt_med*1e3:.1f} ms", flush=True)

    batch = 32
    for K in (16, 64):
        mesh = MeshContext.create(data=1, model=1)
        models, txs, states, _ = build_dcgan(
            dict(DEFAULT_PARAMS), precision="f32", seed=0)
        states = mesh.put_replicated(states)
        mega = make_dcgan_megastep(*models, *txs)
        rng = np.random.RandomState(0)
        xs = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
        ys = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
        ms = np.ones((K, batch), np.float32)
        margs = mesh.put_megabatch(xs, ys, ms)

        # device-resident rng batches, generated once (no per-call programs)
        key = jax.random.PRNGKey(123)
        rng_pool = [jax.device_put(jax.random.split(
            jax.random.fold_in(key, i), K)) for i in range(16)]
        for r in rng_pool:
            r.block_until_ready()

        states, logs = mega(states, *margs, rng_pool[0])
        drain(logs)
        for n_programs in (1, 3, 10):
            t0 = time.perf_counter()
            for i in range(n_programs):
                states, logs = mega(states, *margs,
                                    rng_pool[i % len(rng_pool)])
            drain(logs)
            dt = time.perf_counter() - t0
            sps = n_programs * K / dt
            print(f"K={K} programs/trial={n_programs}: "
                  f"{dt*1e3:.1f} ms total, {dt*1e3/n_programs:.1f} "
                  f"ms/program, {sps:.1f} steps/s", flush=True)
        del margs, states, rng_pool


if __name__ == "__main__":
    main()
