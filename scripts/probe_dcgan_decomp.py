"""Component-wise device-time decomposition of the dcgan fused step.

Times each piece of the step as its own K-iteration lax.scan program
(carry threads a scalar through every iteration so XLA cannot collapse
the loop), K-fit over K in {16, 64} to remove per-program link overhead:

  g_fwd      — generator forward (5 full-res 64x64 small-channel convs)
  fd_fwdbwd  — FrameDiscriminator forward+backward (classic DCGAN D)
  td_fwdbwd  — TemporalDiscriminator forward+backward
  g_chain    — step-5 equivalent: grad through G(x) -> FD + TD
  adam3      — the three Adam updates on fixed gradients

The sum of components approximates the measured full step (~2.7 ms f32
b32); the largest term is the optimization target. Motivated by the
round-3 question of WHERE a latency-bound 9-pass step actually spends
its time (BENCH_NOTES "fused_disc"/"dedup_g" ablations bounded the
serialization cost; this bounds the per-net cost).
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


def kfit(make_fn, args, ks=(16, 64)):
    times = {}
    for K in ks:
        times[K] = timeit(make_fn(K), args)
    dev = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    return dev, times


def main():
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.losses import bce
    from extended_gan_tpu.train.adversarial import _apply_train_with_params

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    batch = 32
    models, txs, states, _ = build_dcgan(
        dict(DEFAULT_PARAMS), precision=precision, seed=0)
    g_model, fd_model, td_model = models
    g_tx, fd_tx, td_tx = txs
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 64, 64, 4), jnp.float32)
    y = jnp.asarray(rng.rand(batch, 64, 64, 4), jnp.float32)
    xy = jnp.concatenate([x, y], axis=-1)
    mask = jnp.ones(batch, jnp.float32)
    key = jax.random.PRNGKey(0)

    def scanner(body):
        """K-iteration scan; carry perturbs the input so iterations chain."""
        def make(K):
            @jax.jit
            def run(*args):
                def sbody(carry, _):
                    return body(carry, *args), None
                out, _ = jax.lax.scan(
                    sbody, jnp.float32(0.0), None, length=K)
                return out
            return run
        return make

    # ---- components -----------------------------------------------------
    def g_fwd(carry, x):
        fake, _ = _apply_train_with_params(
            g_model, states.g.params, states.g.batch_stats,
            x + carry * 1e-9, rngs={"dropout": key})
        return jnp.mean(fake)

    def fd_fwdbwd(carry, y):
        def loss(p):
            out, _ = _apply_train_with_params(
                fd_model, p, states.fd.batch_stats, y + carry * 1e-9)
            return bce(out.reshape(-1), 1.0, mask=mask)
        g = jax.grad(loss)(states.fd.params)
        return jnp.mean(jax.tree_util.tree_leaves(g)[0])

    def td_fwdbwd(carry, xy):
        def loss(p):
            out, _ = _apply_train_with_params(
                td_model, p, states.td.batch_stats, xy + carry * 1e-9,
                rngs={"dropout": key})
            return bce(out.reshape(-1), 1.0, mask=mask)
        g = jax.grad(loss)(states.td.params)
        return jnp.mean(jax.tree_util.tree_leaves(g)[0])

    def g_chain(carry, x):
        def loss(gp):
            fake, _ = _apply_train_with_params(
                g_model, gp, states.g.batch_stats, x + carry * 1e-9,
                rngs={"dropout": key})
            p_f, _ = _apply_train_with_params(
                fd_model, states.fd.params, states.fd.batch_stats, fake)
            p_t, _ = _apply_train_with_params(
                td_model, states.td.params, states.td.batch_stats,
                jnp.concatenate([x, fake], axis=-1), rngs={"dropout": key})
            return (bce(p_f.reshape(-1), 1.0, mask=mask)
                    + bce(p_t.reshape(-1), 1.0, mask=mask))
        g = jax.grad(loss)(states.g.params)
        return jnp.mean(jax.tree_util.tree_leaves(g)[0])

    zero_grads = {
        "g": jax.tree_util.tree_map(jnp.zeros_like, states.g.params),
        "fd": jax.tree_util.tree_map(jnp.zeros_like, states.fd.params),
        "td": jax.tree_util.tree_map(jnp.zeros_like, states.td.params),
    }

    def adam3(carry, _x):
        bump = lambda t: jax.tree_util.tree_map(
            lambda a: a + carry * 1e-12, t)
        sg = states.g.apply_gradients(g_tx, bump(zero_grads["g"]))
        sf = states.fd.apply_gradients(fd_tx, bump(zero_grads["fd"]))
        st = states.td.apply_gradients(td_tx, bump(zero_grads["td"]))
        return (jnp.mean(jax.tree_util.tree_leaves(sg.params)[0])
                + jnp.mean(jax.tree_util.tree_leaves(sf.params)[0])
                + jnp.mean(jax.tree_util.tree_leaves(st.params)[0]))

    comps = [
        ("g_fwd", g_fwd, (x,)),
        ("fd_fwdbwd", fd_fwdbwd, (y,)),
        ("td_fwdbwd", td_fwdbwd, (xy,)),
        ("g_chain", g_chain, (x,)),
        ("adam3", adam3, (x,)),
    ]
    total = 0.0
    print(f"precision={precision} batch={batch}")
    for name, body, args in comps:
        dev, times = kfit(scanner(body), args)
        total += dev
        print(f"{name:10s}: {dev*1e3:7.3f} ms/iter "
              f"(K16 {times[16]*1e3:6.1f} ms, K64 {times[64]*1e3:6.1f} ms)",
              flush=True)
    # full step: 2x D passes (real+fake) + g_fwd + g_chain + adam3
    print(f"sum of components (g_fwd + 2*(fd+td) + g_chain + adam3) would "
          f"double-count; raw sum above = {total*1e3:.3f} ms")


if __name__ == "__main__":
    main()
