"""Rollout serving: K-window horizon in ONE artifact vs K client calls.

The rollout artifact (serve/rollout.py) compiles the autoregressive
horizon into a single lax.scan program. On any serving topology each
program execution pays a fixed dispatch/link cost on top of device time
(measured ~2.3 ms/program through this relay, BENCH_NOTES "time-to-data
correction"; ~10s of us even host-local), so a client that wants K
windows by looping y <- serve(y) pays that cost K times plus K host
round-trips of the intermediate windows — the rollout artifact pays it
once and keeps every intermediate window on-chip.

Protocol: both paths execute EXPORTED artifacts (jax.export round-trip,
exactly what a server runs), timed to data (device_get of the final
window), best of 5.

RESULT (2026-08-18, v5e via relay, b32 64x64x4 DCGAN generator,
ms per K-window horizon, best of 5):

| K  | sequential K calls | horizon artifact | final-only artifact |
|---|---|---|---|
| 4  |  453.9 |  234.9 (1.9x) |  67.9 ( 6.7x) |
| 8  |  877.7 |  402.4 (2.2x) |  72.4 (12.1x) |
| 16 | 1636.4 |  806.7 (2.0x) |  69.5 (23.5x) |

Reading: on this relay the wall time is TRANSFER-bound (each 32x64x64x4
f32 window is ~2 MB). The sequential client moves ~4K MB (every window
up AND down) plus K dispatch+sync round-trips; the full-horizon
artifact moves 2 + 2K MB — hence the steady ~2x. The final-only
artifact moves 2 + 2 MB regardless of K and keeps every intermediate
window in HBM, so it is near-FLAT in K (~70 ms ≈ one round trip +
K x 0.26 ms device time): 6.7x at K=4 growing linearly — 23.5x at
K=16. On a host-local chip the absolute RTTs shrink but the same
asymmetry holds (per-program dispatch + per-window PCIe transfer
multiply by K only on the sequential path). Full record: BENCH_NOTES
"rollout serving".

Usage: python scripts/probe_rollout_serving.py [batch]
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
    from extended_gan_tpu.serve import export_forward, make_rollout
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.RandomState(0)
    print(f"batch={batch} backend={jax.default_backend()}", flush=True)

    models, _, states, _ = build_dcgan(dict(DEFAULT_PARAMS), seed=0)
    variables = {"params": states.g.params,
                 "batch_stats": states.g.batch_stats}
    g_model = models[0]

    def fwd(x):
        return g_model.apply(variables, x, train=False)

    x0 = jnp.asarray(rng.rand(batch, 64, 64, 4), jnp.float32)
    one_step = jax.jit(export_forward(fwd, x0).call)

    def timed(fn):
        fn()  # warm-up (compile + cache)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    for K in (4, 8, 16):
        rolled = jax.jit(export_forward(make_rollout(fwd, K), x0).call)
        rolled_final = jax.jit(export_forward(
            make_rollout(fwd, K, final_only=True), x0).call)

        def run_seq():
            y = x0
            for _ in range(K):
                # a looping client round-trips every window
                y = jnp.asarray(np.asarray(one_step(y)))
            return y

        def run_rolled():
            return jax.device_get(rolled(x0))

        def run_final():
            return jax.device_get(rolled_final(x0))

        t_seq = timed(run_seq)
        t_roll = timed(run_rolled)
        t_final = timed(run_final)
        print(f"K={K:3d}: sequential {t_seq * 1e3:8.1f} ms   "
              f"horizon {t_roll * 1e3:8.1f} ms ({t_seq / t_roll:4.1f}x)   "
              f"final-only {t_final * 1e3:8.1f} ms "
              f"({t_seq / t_final:4.1f}x)", flush=True)


if __name__ == "__main__":
    main()
