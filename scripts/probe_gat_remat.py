"""A/B: conv-GAT megastep with remat (jax.checkpoint) ON vs OFF.

The round-5 attribution (BENCH_NOTES "conv-GAT step attribution") pinned
the step at its HBM roofline: 18.7 GF but 1.79 GB accessed per b32 step
— the MXU is ~99% idle while the 74-wide conv-bottleneck intermediates
round-trip HBM between forward and backward. `remat=True`
(gat_trainer.py: whole-forward jax.checkpoint) is the classic
FLOPs-for-bytes trade — the backward recomputes the intermediates
instead of loading the stored copies — and on a bandwidth-bound step
recomputation is nearly free. This probe K-fits the megastep remat
on/off at the headline geometry (b32) and the matched-batch bar
geometry (b128), f32 and bf16, to decide whether remat should be the
composed-config default.

Run: python scripts/probe_gat_remat.py [f32|bf16] [batch]
(no args = the full 2x2 grid)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def drain(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.gat_trainer import make_gat_megastep
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    hw, T, V = 20, 4, 6
    key = jax.random.PRNGKey(0)
    want_prec = sys.argv[1] if len(sys.argv) > 1 else None
    want_batch = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if want_prec not in (None, "f32", "bf16"):
        sys.exit(f"unknown precision {want_prec!r} (f32|bf16)")
    if want_batch not in (None, 32, 128):
        sys.exit(f"batch {want_batch} not in the probe grid (32|128)")

    for precision in ("f32", "bf16"):
        if want_prec and precision != want_prec:
            continue
        dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        for batch in (32, 128):
            if want_batch and batch != want_batch:
                continue
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
            y = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
            for remat in (False, True):
                model = build_model(
                    "temporal", image_width=hw, image_height=hw,
                    n_vertices=V, mapping_type="conv", dtype=dtype,
                    use_pallas=True)
                tx = adam(1e-3, weight_decay=0.01)
                state = create_net_state(model, tx, KeySeq(0).next(),
                                         jnp.zeros((2, hw, hw, T, V)))
                mega = make_gat_megastep(model, tx, remat=remat)

                def time_full(K):
                    xs = jnp.broadcast_to(x, (K,) + x.shape)
                    ys = jnp.broadcast_to(y, (K,) + y.shape)
                    ms = jnp.ones((K, batch), jnp.float32)
                    rngs = jax.random.split(key, K)
                    st = jax.tree_util.tree_map(jnp.copy, state)
                    st, logs = mega(st, xs, ys, ms, rngs)
                    drain(logs)
                    best = float("inf")
                    for _ in range(3):
                        st2 = jax.tree_util.tree_map(jnp.copy, state)
                        t0 = time.perf_counter()
                        for _ in range(10):
                            st2, logs = mega(st2, xs, ys, ms, rngs)
                        drain(logs)
                        best = min(best, (time.perf_counter() - t0) / 10)
                    return best

                print(f"[{precision} b{batch} remat={remat}] compiling/"
                      "timing K=16...", flush=True)
                t16 = time_full(16)
                print(f"  K16 {t16*1e3:.1f} ms; K=64...", flush=True)
                t64 = time_full(64)
                dev = (t64 - t16) / 48
                print(f"{precision} b{batch:<3} remat={remat!s:5}: "
                      f"{dev*1e3:7.3f} ms/step device "
                      f"(K16 {t16*1e3:6.1f} ms, K64 {t64*1e3:6.1f} ms, "
                      f"{1.0/dev:.1f} steps/s est)", flush=True)


if __name__ == "__main__":
    main()
