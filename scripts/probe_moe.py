"""Probe: on-chip cost of the Switch-MoE bottleneck (models/moe.py).

Measures the SmaAt-UNet (unet family) fused train step dense vs
``moe_experts`` in {4, 8} at the KNMI geometry, using the two-K megastep
fit (BENCH_NOTES "Second correction") that separates the true device
step time from the relay's per-program link overhead:

    t(K) = overhead + K * device_ms  ->  device_ms = (t(K2)-t(K1))/(K2-K1)

MoE doubles(+) the parameter count at constant per-token FLOPs; the
question this probe answers is what the routing einsums + expert FFN
cost per step on the real chip, so BENCH_NOTES can record whether the
conditional capacity is wall-clock-free (bottleneck tokens are few:
B * ceil(H/16) * ceil(W/16)).
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


def time_mega(mega, state, margs, rng_pool, n_programs=10):
    state, logs = mega(state, *margs, rng_pool[0])
    drain(logs)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_programs):
            state, logs = mega(state, *margs, rng_pool[i % len(rng_pool)])
        drain(logs)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best * 1e3 / n_programs  # ms/program


def bench_unet(moe_experts, K, batch=32, hw=20):
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.gat_trainer import make_gat_megastep
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state, param_count

    mesh = MeshContext.create(data=1, model=1)
    model = build_model("unet", image_width=hw, image_height=hw,
                        n_vertices=6, mapping_type="conv",
                        moe_experts=moe_experts)
    tx = adam(1e-3, weight_decay=0.01)
    state = create_net_state(model, tx, KeySeq(0).next(),
                             jnp.zeros((2, hw, hw, 4, 6)))
    state = mesh.put_replicated(state)
    mega = make_gat_megastep(
        model, tx, moe_aux_weight=0.01 if moe_experts else 0.0)
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
    return time_mega(mega, state, margs, pool), param_count(state)


def main():
    for e in (0, 4, 8):
        t = {}
        n_params = None
        for K in (8, 16):
            t[K], n_params = bench_unet(e, K)
            print(f"unet moe_experts={e} K={K}: {t[K]:.1f} ms/program "
                  f"-> {K * 1e3 / t[K]:.1f} steps/s", flush=True)
        dev = (t[16] - t[8]) / 8.0
        print(f"unet moe_experts={e} ({n_params} params) K-fit: "
              f"device {dev:.3f} ms/step, "
              f"overhead {t[8] - 8 * dev:.1f} ms/program", flush=True)


if __name__ == "__main__":
    main()
