"""Measure the dedup_g (single generator forward via jax.vjp) step on chip.

Same true-rate K-fit protocol as probe_fused_disc.py. dedup_g is
numerically bit-identical to the default body (same params/stats/dropout
key => identical forward; chain rule composition unchanged —
tests/test_dedup_g.py), so this probe decides only whether XLA was
already CSE-ing the duplicated G forward (no win) or re-executing it
(win ~= one G forward per step). Also tries dedup_g+fused_disc.
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


def time_mega(mega, states, margs, rng_pool, n_programs=10, trials=3):
    states, logs = mega(states, *margs, rng_pool[0])
    drain(logs)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for i in range(n_programs):
            states, logs = mega(states, *margs,
                                rng_pool[i % len(rng_pool)])
        drain(logs)
        best = min(best, (time.perf_counter() - t0) / n_programs)
    return best, states


def main():
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_megastep

    batch = 32
    for precision in ("f32", "bf16"):
        for dedup, fused in ((False, False), (True, False), (True, True)):
            times = {}
            for K in (16, 64):
                mesh = MeshContext.create(data=1, model=1)
                models, txs, states, _ = build_dcgan(
                    dict(DEFAULT_PARAMS), precision=precision, seed=0)
                states = mesh.put_replicated(states)
                mega = make_dcgan_megastep(*models, *txs,
                                           fused_disc=fused, dedup_g=dedup)
                rng = np.random.RandomState(0)
                xs = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
                ys = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
                ms = np.ones((K, batch), np.float32)
                margs = mesh.put_megabatch(xs, ys, ms)
                key = jax.random.PRNGKey(123)
                rng_pool = [jax.device_put(jax.random.split(
                    jax.random.fold_in(key, i), K)) for i in range(8)]
                for r in rng_pool:
                    r.block_until_ready()
                t, states = time_mega(mega, states, margs, rng_pool)
                times[K] = t
                print(f"{precision} dedup={dedup} fused={fused} K={K}: "
                      f"{t*1e3:.1f} ms/program, {K/t:.1f} steps/s",
                      flush=True)
                del margs, states, rng_pool
            dev = (times[64] - times[16]) / (64 - 16)
            ovh = times[16] - 16 * dev
            print(f"  -> K-fit: device {dev*1e3:.3f} ms/step, "
                  f"overhead {ovh*1e3:.1f} ms/program", flush=True)


if __name__ == "__main__":
    main()
