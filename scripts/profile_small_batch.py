"""Attribute the small-batch DCGAN step cost (VERDICT round 1, item 3).

Measures on the real chip:
- full fused step at batch 32 / 64 / 128 (wall + XLA cost-analysis FLOPs),
- component programs at batch 32: G fwd+bwd, FD real+fake grads,
  TD real+fake grads, the G-through-updated-Ds grad, Adam updates alone,
- a dropout-RNG on/off ablation of the full step.

Output: a small JSON report (stdout) for BENCH_NOTES.md.
"""

# WARNING (round-3 finding, BENCH_NOTES): jax.block_until_ready does
# NOT block through the axon relay -- timings below are HOST DISPATCH
# rates on relay-attached rigs. bench.py (time-to-data drain) is the
# honest harness; this script's numbers are only comparable to each
# other on a locally-attached chip.

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan
from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step
from extended_gan_tpu.train.losses import bce


def time_step(step, states, x, y, mask, key, n=50, trials=3):
    """Time a state-donating step by threading the state (bench.py style)."""
    s, logs = step(states, x, y, mask, key)
    jax.block_until_ready(logs["errG"])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            s, logs = step(s, x, y, mask, key)
        jax.block_until_ready(logs["errG"])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def timeit(fn, *args, n=50, trials=3):
    """Time a pure (non-donating) jitted function."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


# NOTE: XLA cost analysis via .lower().compile() corrupts the axon relay
# backend session (subsequent eager ops fail INVALID_ARGUMENT) — measured
# FLOPs come from the round-1 cost analysis instead (BENCH_NOTES.md):
# full step 103.7 GFLOP @ b32, 414.5 GFLOP @ b128 (4x batch = 4x FLOPs).
STEP_GFLOP = {32: 103.7, 64: 207.3, 128: 414.5}


def build(batch, dropout=None, batchnorm=True):
    params = dict(DEFAULT_PARAMS)
    mesh = MeshContext.create(data=1, model=1)
    if dropout is None and batchnorm:
        models, txs, states, _ = build_dcgan(params, seed=0)
    else:
        from extended_gan_tpu.models.dcgan import (
            FrameDiscriminator,
            Generator,
            TemporalDiscriminator,
        )
        from extended_gan_tpu.train.dcgan_trainer import GANStates
        from extended_gan_tpu.train.optim import adam
        from extended_gan_tpu.train.state import create_net_state

        dr = 0.01 if dropout is None else dropout
        g_model = Generator(nc=4, dropout=dr)
        fd_model = FrameDiscriminator(nc=4, ndf=64)
        td_model = TemporalDiscriminator(nc=4, ndf=64, dropout=dr)
        txs = tuple(adam(2e-4, b1=0.5) for _ in range(3))
        ks = KeySeq(0)
        sample = jnp.zeros((2, 64, 64, 4))
        sample2 = jnp.zeros((2, 64, 64, 8))
        states = GANStates(
            g=create_net_state(g_model, txs[0], ks.next(), sample),
            fd=create_net_state(fd_model, txs[1], ks.next(), sample),
            td=create_net_state(td_model, txs[2], ks.next(), sample2),
        )
        models = (g_model, fd_model, td_model)
    states = mesh.put_replicated(states)
    step = make_dcgan_train_step(*models, *txs)
    rng = np.random.RandomState(0)
    x = rng.rand(batch, 64, 64, 4).astype(np.float32)
    y = rng.rand(batch, 64, 64, 4).astype(np.float32)
    mask = np.ones(batch, np.float32)
    x, y, mask = mesh.put_batch(x, y, mask)
    return models, states, step, (x, y, mask)


def main():
    report = {}
    key = jax.random.PRNGKey(0)

    # ---- full step across batch sizes --------------------------------
    for b in (32, 64, 128):
        models, states, step, (x, y, mask) = build(b)
        dt = time_step(step, states, x, y, mask, key)
        fl = STEP_GFLOP[b]
        report[f"full_step_b{b}"] = {
            "ms": round(1e3 * dt, 3),
            "gflop": fl,
            "tflops": round(fl / dt / 1e3, 1),
        }
        print(f"b{b}: {report[f'full_step_b{b}']}", file=sys.stderr)

    # ---- ablations at b32 ---------------------------------------------
    for name, kw in (
        ("no_dropout", dict(dropout=0.0)),
        ("with_dropout", dict(dropout=0.01)),
    ):
        models, states, step, (x, y, mask) = build(32, **kw)
        dt = time_step(step, states, x, y, mask, key)
        report[f"b32_{name}_ms"] = round(1e3 * dt, 3)
        print(f"b32 {name}: {report[f'b32_{name}_ms']} ms", file=sys.stderr)

    # ---- component programs at b32 ------------------------------------
    models, states, step, (x, y, mask) = build(32)
    g_model, fd_model, td_model = models

    def g_fwd_bwd(g_state):
        def loss(p):
            out, _ = g_model.apply(
                {"params": p, "batch_stats": g_state.batch_stats}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return jnp.sum(out**2)

        return jax.value_and_grad(loss)(g_state.params)

    def d_grads(fd_state, td_state):
        xy = jnp.concatenate([x, y], axis=-1)

        def loss(fp, tp):
            pf, _ = fd_model.apply(
                {"params": fp, "batch_stats": fd_state.batch_stats}, y,
                train=True, mutable=["batch_stats"])
            pt, _ = td_model.apply(
                {"params": tp, "batch_stats": td_state.batch_stats}, xy,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return bce(pf.reshape(-1), 1.0) + bce(pt.reshape(-1), 1.0)

        return jax.value_and_grad(loss, argnums=(0, 1))(
            fd_state.params, td_state.params)

    def adam_only(s):
        zg = jax.tree_util.tree_map(jnp.zeros_like, s.g.params)
        from extended_gan_tpu.train.optim import adam as mk

        return s.g.apply_gradients(mk(2e-4, b1=0.5), zg)

    for name, fn, args in (
        ("g_fwd_bwd", jax.jit(g_fwd_bwd), (states.g,)),
        ("d_real_grads", jax.jit(d_grads), (states.fd, states.td)),
        ("adam_only", jax.jit(adam_only), (states,)),
    ):
        dt = timeit(fn, *args, n=50)
        report[f"b32_{name}_ms"] = round(1e3 * dt, 3)
        print(f"{name}: {report[f'b32_{name}_ms']} ms", file=sys.stderr)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
