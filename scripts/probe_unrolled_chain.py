"""Probe: K steps UNROLLED in one jit vs the lax.scan megastep.

probe_megastep_overheads.py isolated the megastep's cost structure:
in-scan marginal step time ~2.67 ms vs ~0.92 ms for the donated single
step (the XLA while-loop body misses optimizations the straight-line
program gets), plus ~6.6 ms fixed per-program overhead and a ~30 ms
drain RTT. An unrolled chain (Python loop of the step body inside one
jit) should produce straight-line code at single-step quality while
still paying dispatch once per K steps.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def drain(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import _make_dcgan_step_body

    batch = 32
    for K in (8, 16):
        mesh = MeshContext.create(data=1, model=1)
        models, txs, states, _ = build_dcgan(
            dict(DEFAULT_PARAMS), precision="f32", seed=0)
        states = mesh.put_replicated(states)
        body = _make_dcgan_step_body(*models, *txs)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chain(states, xs, ys, ms, rngs):
            logs = None
            for i in range(K):
                states, logs = body(states, xs[i], ys[i], ms[i], rngs[i])
            return states, logs

        rng = np.random.RandomState(0)
        xs = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
        ys = rng.rand(K, batch, 64, 64, 4).astype(np.float32)
        ms = np.ones((K, batch), np.float32)
        margs = mesh.put_megabatch(xs, ys, ms)
        key = jax.random.PRNGKey(123)
        rng_pool = [jax.device_put(jax.random.split(
            jax.random.fold_in(key, i), K)) for i in range(16)]
        for r in rng_pool:
            r.block_until_ready()

        t0 = time.perf_counter()
        states, logs = chain(states, *margs, rng_pool[0])
        drain(logs)
        print(f"K={K} compile+first: {time.perf_counter()-t0:.1f} s",
              flush=True)
        for n_programs in (3, 10):
            t0 = time.perf_counter()
            for i in range(n_programs):
                states, logs = chain(states, *margs,
                                     rng_pool[i % len(rng_pool)])
            drain(logs)
            dt = time.perf_counter() - t0
            print(f"K={K} unrolled programs/trial={n_programs}: "
                  f"{dt*1e3/n_programs:.1f} ms/program, "
                  f"{n_programs*K/dt:.1f} steps/s", flush=True)
        del margs, states, rng_pool


if __name__ == "__main__":
    main()
