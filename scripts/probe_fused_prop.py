"""Fused dcgan step device time: FusedProp vs the default body.

FusedProp (arxiv 2004.03335; dcgan_trainer._fused_prop_step) removes one
forward through each discriminator and merges the D-fake and G-chain
backwards into one 2-cotangent pass — on a step that is latency-bound by
its chain of serial net passes (~2.7 ms device at b32 f32), dropping
chain links is the lever that has worked before (fused_disc bf16 +9%).

Method: megastep (lax.scan of K steps, donated state) timed to data at
K in {16, 64}; slope = true device ms/step. Same protocol as bench.py's
two-K decomposition and probe_packed_g.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_megastep

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    rng = np.random.RandomState(0)
    print(f"precision={precision} batch={batch} "
          f"backend={jax.default_backend()}", flush=True)

    results = {}
    # (fused_prop, fused_disc): default, FusedProp alone, minimal chain
    for mode in ((False, False), (True, False), (True, True)):
        fused_prop, fused_disc = mode
        models, txs, states, keys = build_dcgan(
            dict(DEFAULT_PARAMS), precision=precision, seed=0)
        mega = make_dcgan_megastep(*models, *txs, fused_prop=fused_prop,
                                   fused_disc=fused_disc)

        per_k = {}
        for K in (16, 64):
            xs = jnp.asarray(rng.rand(K, batch, 64, 64, 4), jnp.float32)
            ys = jnp.asarray(rng.rand(K, batch, 64, 64, 4), jnp.float32)
            masks = jnp.ones((K, batch), jnp.float32)
            rngs = jax.random.split(jax.random.PRNGKey(3), K)

            s = jax.tree_util.tree_map(jnp.copy, states)
            s, logs = mega(s, xs, ys, masks, rngs)  # compile + warm
            float(jax.device_get(logs["errG"].ravel()[-1]))
            best = float("inf")
            for _ in range(4):
                s2 = jax.tree_util.tree_map(jnp.copy, s)
                t0 = time.perf_counter()
                s2, logs = mega(s2, xs, ys, masks, rngs)
                float(jax.device_get(logs["errG"].ravel()[-1]))
                best = min(best, time.perf_counter() - t0)
            per_k[K] = best
            print(f"  mode={mode} K={K}: {best*1e3:8.2f} ms "
                  f"({best/K*1e3:6.3f} ms/step raw)", flush=True)
        slope = (per_k[64] - per_k[16]) / 48.0
        results[mode] = slope
        print(f"  mode={mode}: device {slope*1e3:.3f} ms/step "
              f"({1.0/slope:.1f} steps/s)", flush=True)

    base = results[(False, False)]
    print(f"speedup fused_prop alone: {base/results[(True, False)]:.2f}x; "
          f"minimal chain (x fused_disc): {base/results[(True, True)]:.2f}x")


if __name__ == "__main__":
    main()
