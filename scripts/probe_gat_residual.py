"""Bisect the conv-GAT megastep residual (probe_gat_decomp.py follow-up).

probe_gat_decomp measured: full megastep 2.106 ms/step but
fwd+bwd+adam on FROZEN params only 0.711 ms/step — a 1.4 ms/step
residual that the lean step body (masked MSE + two scalar logs,
gat_trainer.py:74-110) cannot obviously explain. Candidate causes,
each isolated here as its own K-scanned program (two-K fit 16/64):

  exact_grad   — value_and_grad of the EXACT loss body (mask +
                 mean_pred bonus + aux) on frozen params: is the loss
                 body (vs the probe's plain mean MSE) the cost?
  chain_nolog  — state CARRIED through the scan (params serially
                 depend on the previous step's adam), no logs: is the
                 params carry / serial dependency the cost?
  chain_logs   — + the stacked logs dict (== wrap_megastep): is log
                 stacking the cost?
  chain_u4 /   — the real megastep body with lax.scan unroll=4/8: does
  chain_u8       unrolling recover overlap if the cost is per-iteration
                 scheduling latency?

Run: python scripts/probe_gat_residual.py [f32|bf16]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def drain(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, args, n_programs=10, trials=3):
    out = fn(*args)
    drain(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_programs):
            out = fn(*args)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / n_programs)
    return best


def main():
    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.gat_trainer import _make_gat_step_body
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    batch, hw, T, V = 32, 20, 4, 6

    model = build_model("temporal", image_width=hw, image_height=hw,
                        n_vertices=V, mapping_type="conv", dtype=dtype,
                        use_pallas=True)
    tx = adam(1e-3, weight_decay=0.01)
    state = create_net_state(model, tx, KeySeq(0).next(),
                             jnp.zeros((2, hw, hw, T, V)))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
    y = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)
    mask = jnp.ones(batch, jnp.float32)
    key = jax.random.PRNGKey(0)
    body = _make_gat_step_body(model, tx)

    def batches(K):
        return (jnp.broadcast_to(x, (K,) + x.shape),
                jnp.broadcast_to(y, (K,) + y.shape),
                jnp.ones((K, batch), jnp.float32),
                jax.random.split(key, K))

    # ---- exact_grad: the exact step-body loss, frozen params ------------
    def exact_grad_make(K):
        @jax.jit
        def run(x, y, mask):
            m = mask.reshape((-1,) + (1,) * (y.ndim - 1))

            def loss_fn(params, xi):
                y_hat = model.apply({"params": params}, xi, train=True,
                                    rngs={"dropout": key})
                n_el = jnp.maximum(jnp.sum(mask), 1.0) * jnp.float32(
                    y[0].size)
                sq = jnp.sum(((y_hat - y) ** 2) * m)
                mean_pred = jnp.sum(y_hat * m) / n_el
                return sq / n_el - 0.0005 * mean_pred, sq

            def sbody(carry, _):
                (loss, sq), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, x + carry * 1e-9)
                return jnp.float32(
                    loss + jnp.mean(jax.tree_util.tree_leaves(g)[0])), None

            out, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=K)
            return out
        return run

    # ---- chain_nolog / chain_logs: the real body, state carried ---------
    def chain_make(K, with_logs, unroll=1):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st, xs, ys, ms, rs):
            def sbody(s, inp):
                s, logs = body(s, *inp)
                return s, (logs if with_logs else None)

            st, stacked = jax.lax.scan(sbody, st, (xs, ys, ms, rs),
                                       unroll=unroll)
            if with_logs:
                logs = {k: jnp.sum(v, axis=0) if k.endswith("_nd")
                        else v[-1] for k, v in stacked.items()}
                return st, logs
            return st, None
        return run

    def time_chain(K, with_logs, unroll=1):
        fn = chain_make(K, with_logs, unroll)
        args = batches(K)
        st = jax.tree_util.tree_map(jnp.copy, state)
        st, _ = fn(st, *args)
        drain(st.params)
        best = float("inf")
        for _ in range(3):
            st2 = jax.tree_util.tree_map(jnp.copy, state)
            t0 = time.perf_counter()
            for _ in range(10):
                st2, _ = fn(st2, *args)
            drain(st2.params)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    print(f"precision={precision} batch={batch}")
    for name, timer in (
        ("exact_grad", lambda K: timeit(exact_grad_make(K),
                                        (x, y, mask))),
        ("chain_nolog", lambda K: time_chain(K, False)),
        ("chain_logs", lambda K: time_chain(K, True)),
        ("chain_u4", lambda K: time_chain(K, True, unroll=4)),
        ("chain_u8", lambda K: time_chain(K, True, unroll=8)),
    ):
        t16, t64 = timer(16), timer(64)
        dev = (t64 - t16) / 48
        print(f"{name:12s}: {dev*1e3:7.3f} ms/step "
              f"(K16 {t16*1e3:6.1f} ms, K64 {t64*1e3:6.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
