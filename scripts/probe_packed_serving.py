"""Generator-ONLY application device time: packed vs default layout.

The full-fused-step verdict (BENCH_NOTES "packed_g ablation") was
NEUTRAL: training applies the generator ~3x per step, so the pack/unpack
phase reshapes repeat and cancel the per-conv win. SERVING applies it
exactly once per request — one repack, five MXU-shaped convs — which is
where the per-conv 1.2-1.5x should surface end-to-end. This probe
measures that case directly: a K-chain of inference applications
(y <- G(y), forced serial), two-K fit, slope = true device ms per
application.

RESULT (2026-08-18, v5e via relay): the hypothesis FAILED — packed
loses at every serving operating point (0.88x f32 b32, 0.92x bf16 b32,
0.26x f32 b128). Forward-only the per-conv win (~0.14 ms) is under the
repack cost (~0.17 ms), and at b128 the default lowering scales 28%
better while packed scales 2.6x worse. Full record: BENCH_NOTES
"packed_g ablation".

Usage: python scripts/probe_packed_serving.py [f32|bf16] [batch]
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
    from extended_gan_tpu.models.dcgan import Generator
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    rng = np.random.RandomState(0)
    print(f"precision={precision} batch={batch} "
          f"backend={jax.default_backend()}", flush=True)

    # one checkpoint-identical param tree, applied through both layouts
    models, _, states, _ = build_dcgan(
        dict(DEFAULT_PARAMS), precision=precision, seed=0)
    variables = {"params": states.g.params}
    if states.g.batch_stats:
        variables["batch_stats"] = states.g.batch_stats

    x0 = jnp.asarray(rng.rand(batch, 64, 64, 4), jnp.float32)

    results = {}
    for packed in (False, True):
        g_model = Generator(nc=models[0].nc, dropout=models[0].dropout,
                            dtype=dtype, packed=packed)

        def chain(x, K, g_model=g_model):
            def body(y, _):
                return g_model.apply(variables, y, train=False), None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return y

        per_k = {}
        for K in (16, 64):
            run = jax.jit(lambda x, K=K: chain(x, K))
            y = run(x0)  # compile + warm
            float(jax.device_get(y.ravel()[-1]))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                y = run(x0)
                float(jax.device_get(y.ravel()[-1]))  # time-to-data
                best = min(best, time.perf_counter() - t0)
            per_k[K] = best
            print(f"  packed={packed} K={K}: {best*1e3:8.2f} ms "
                  f"({best/K*1e3:6.3f} ms/app raw)", flush=True)
        slope = (per_k[64] - per_k[16]) / 48.0
        results[packed] = slope
        print(f"  packed={packed}: device {slope*1e3:.3f} ms/application "
              f"({batch/slope:.0f} samples/s)", flush=True)

    print(f"serving speedup (default/packed): "
          f"{results[False]/results[True]:.2f}x")


if __name__ == "__main__":
    main()
