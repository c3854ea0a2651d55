"""Kernel-level A/B: fused conv-mapping bottleneck vs the XLA composition.

probe_gat_decomp.py attributed the conv-GAT step's HBM-roofline cost to
the mapping convs' 74-wide intermediates round-tripping HBM
(BENCH_NOTES round 5). This times the isolated mapping — the 3 vmapped
hidden heads at the headline geometry — four ways (two-K fit, K=16/64):

  xla_fwd / xla_fwdbwd       nn.Conv composition (what use_pallas=False runs)
  fused_fwd / fused_fwdbwd   ops/pallas/gat_mapping.py

Run: python scripts/probe_gat_mapping_kernel.py [batch]
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


def kfit(make, args):
    t16, t64 = timeit(make(16), args), timeit(make(64), args)
    return (t64 - t16) / 48, t16, t64


def scanner(body):
    def make(K):
        @jax.jit
        def run(*args):
            def sbody(carry, _):
                return body(carry, *args), None

            out, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=K)
            return out

        return run

    return make


def main():
    import flax.linen as nn

    from extended_gan_tpu.models.gat.gat3d import _Mapping

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    hw, T, V = 20, 4, 6
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, hw, hw, T, V), jnp.float32)

    def build(use_pallas):
        VMap = nn.vmap(_Mapping, in_axes=None, out_axes=0, axis_size=3,
                       variable_axes={"params": 0},
                       split_rngs={"params": True})
        m = VMap(T, T, "conv", use_pallas=use_pallas)
        p = m.init(jax.random.PRNGKey(1), x[:2])["params"]
        return m, p

    def consume(tree):
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(tree))

    # ---- im2col-matmul reformulation (plain XLA, no Pallas) -------------
    # XLA's conv lowering at these tiny channel counts reports ~2.5x the
    # naive activation bytes (cost analysis 1.79 GB/step vs ~0.7 GB hand
    # count) — internal layout padding/transposes. Express the 3x3 convs
    # as explicit 9-shift patch matmuls instead: dot_generals on
    # (positions, taps*C) operands with clean (8,128) layouts.
    _, p_ref = build(False)

    def _patches(y):  # (N, H, W, C) -> (N, H, W, 9C)
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jnp.concatenate(
            [yp[:, dy:dy + hw, dx:dx + hw, :] for dy in range(3)
             for dx in range(3)], axis=-1)

    hp = jax.lax.Precision.HIGHEST

    def im2col_head(y, hp_params):
        c1 = hp_params["conv1"]
        w1 = c1["kernel"].reshape(9 * T, -1)
        h1 = jnp.maximum(
            jnp.einsum("nhwk,kf->nhwf", _patches(y), w1, precision=hp)
            + c1["bias"], 0.0)
        c2 = hp_params["conv2"]
        h2 = jnp.maximum(
            jnp.einsum("nhwk,kf->nhwf", h1, c2["kernel"][0, 0],
                       precision=hp) + c2["bias"], 0.0)
        c3 = hp_params["conv3"]
        w3 = c3["kernel"].reshape(9 * h1.shape[-1], -1)
        return jnp.einsum("nhwk,kf->nhwf", _patches(h2), w3,
                          precision=hp) + c3["bias"]

    def im2col_apply(pp, x):
        b, h, w, t, v = x.shape
        xb = x.transpose(0, 4, 1, 2, 3).reshape(b * v, h, w, t)
        out = jax.vmap(lambda hp_: im2col_head(xb, hp_))(pp)
        return out.reshape(3, b, v, h, w, T).transpose(0, 1, 3, 4, 5, 2)

    def variants():
        m_x, p_x = build(False)
        yield ("xla", lambda pp, xx: m_x.apply({"params": pp}, xx), p_x)
        yield ("im2col", im2col_apply, p_x)
        m_f, p_f = build(True)
        yield ("fused", lambda pp, xx: m_f.apply({"params": pp}, xx), p_f)

    for label, apply_fn, p in variants():
        def fwd(carry, x):
            return jnp.float32(jnp.mean(apply_fn(p, x + carry * 1e-9)))

        def fwdbwd(carry, x):
            def loss(pp):
                return jnp.mean(apply_fn(pp, x + carry * 1e-9) ** 2)

            return jnp.float32(consume(jax.grad(loss)(p)))

        # parity vs the nn.Conv composition before timing
        if label == "im2col":
            m_x, _ = build(False)
            ref = m_x.apply({"params": p}, x)
            got = apply_fn(p, x)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"im2col parity max abs err: {err:.2e}", flush=True)

        for comp, body in (("fwd", fwd), ("fwdbwd", fwdbwd)):
            dev, t16, t64 = kfit(scanner(body), (x,))
            print(f"{label}_{comp:7s}: {dev * 1e3:7.3f} ms/iter "
                  f"(K16 {t16 * 1e3:6.1f} ms, K64 {t64 * 1e3:6.1f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
