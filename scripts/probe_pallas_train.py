"""A/B: conv-GAT training step with Pallas attention ON vs OFF.

probe_gat_decomp.py (honest, all-grad-leaves version) attributes
~0.9 ms of the 2.08 ms conv-GAT device step to attention fwd+bwd while
attention FORWARD is only ~0.15 ms. The Pallas kernel's custom_vjp
backward (ops/pallas/gat_attention.py::_bwd) re-runs the ENTIRE
reference forward inside jax.vjp instead of using saved residuals —
plain XLA autodiff keeps softmax/attention residuals and computes only
the cotangent einsums. So the kernel that wins at inference may LOSE
at training. This probe K-fits the full megastep and fwdbwd with
use_pallas on/off to decide what the training default should be.

Run: python scripts/probe_pallas_train.py [nhwc|chanfirst]
(the optional arg selects the conv-mapping layout for BOTH legs —
"chanfirst" = the positions-on-lanes XLA reformulation)
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

    import sys as _sys

    conv_impl = _sys.argv[1] if len(_sys.argv) > 1 else "nhwc"
    batch, hw, T, V = 32, 20, 4, 6
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
    y = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
    key = jax.random.PRNGKey(0)
    print(f"conv_impl={conv_impl}")

    for use_pallas in (True, False):
        model = build_model("temporal", image_width=hw, image_height=hw,
                            n_vertices=V, mapping_type="conv",
                            use_pallas=use_pallas, conv_impl=conv_impl)
        tx = adam(1e-3, weight_decay=0.01)
        state = create_net_state(model, tx, KeySeq(0).next(),
                                 jnp.zeros((2, hw, hw, T, V)))
        mega = make_gat_megastep(model, tx)

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

        t16, t64 = time_full(16), time_full(64)
        dev = (t64 - t16) / 48
        print(f"use_pallas={use_pallas}: {dev*1e3:7.3f} ms/step device "
              f"(K16 {t16*1e3:6.1f} ms, K64 {t64*1e3:6.1f} ms, "
              f"{1.0/dev:.1f} steps/s est)", flush=True)


if __name__ == "__main__":
    main()
