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

    # ---- channels-first / positions-on-lanes reformulation (plain XLA) --
    # Every NHWC-ish layout puts C (4..74 wide) on the 128-lane axis and
    # pays up to 32x padded bytes. Put the POSITION axis on lanes instead:
    # activations ride as (N, C, P) with P = apron-padded row-flattened
    # positions; a 3x3 conv is nine shifted lane-slices contracted over C
    # ("ncp,cf->nfp"), ring/apron rows re-zeroed by a (1, 1, P) mask
    # between the 3x3 layers — the fused Pallas kernel's exact math, but
    # in XLA where the compiler owns fusion and scheduling.
    A = 24  # lane apron >= max shift ph+1

    def _cf_geom(h):
        ph = h + 2
        return ph, ph * ph

    def _cf_mask(h):
        ph, P = _cf_geom(h)
        g = np.zeros((ph, ph), np.float32)
        g[1:h + 1, 1:h + 1] = 1.0
        m = np.zeros((P + 2 * A,), np.float32)
        m[A:A + P] = g.reshape(-1)
        return jnp.asarray(m)[None, None, :]

    def chanfirst_head(yc, hp_params, h):
        # yc: (N, C, P + 2A) apron-padded channels-first rows
        ph, P = _cf_geom(h)
        mask = _cf_mask(h)
        shifts = [dy * ph + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

        def conv3x3(z, kern, bias):
            k9 = kern.reshape(9, kern.shape[2], kern.shape[3])
            acc = 0.0
            for i, k in enumerate(shifts):
                acc = acc + jnp.einsum(
                    "ncp,cf->nfp", z[:, :, A + k:A + k + P], k9[i],
                    precision=hp)
            return acc + bias[None, :, None]

        def repad(z):  # (N, F, P) -> apron-padded + ring-zeroed
            return jnp.pad(z, ((0, 0), (0, 0), (A, A))) * mask

        c1, c2, c3 = (hp_params["conv1"], hp_params["conv2"],
                      hp_params["conv3"])
        h1 = jnp.maximum(conv3x3(yc, c1["kernel"], c1["bias"]), 0.0)
        h2 = jnp.maximum(
            jnp.einsum("ncp,cf->nfp", h1, c2["kernel"][0, 0],
                       precision=hp) + c2["bias"][None, :, None], 0.0)
        out = conv3x3(repad(h2), c3["kernel"], c3["bias"])
        return out  # (N, C_out, P)

    def chanfirst_apply(pp, x):
        b, h, w, t, v = x.shape
        ph, P = _cf_geom(h)
        xb = x.transpose(0, 4, 1, 2, 3).reshape(b * v, h, w, t)
        xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
        yc = xp.reshape(b * v, ph * ph, t).transpose(0, 2, 1)
        yc = jnp.pad(yc, ((0, 0), (0, 0), (A, A)))
        out = jax.vmap(lambda hp_: chanfirst_head(yc, hp_, h))(pp)
        out = out.reshape(3, b * v, T, ph, ph)[:, :, :, 1:h + 1, 1:h + 1]
        out = out.reshape(3, b, v, T, h, w)
        return out.transpose(0, 1, 4, 5, 3, 2)  # (3, B, H, W, T', V)

    def variants():
        m_x, p_x = build(False)
        yield ("xla", lambda pp, xx: m_x.apply({"params": pp}, xx), p_x)
        yield ("im2col", im2col_apply, p_x)
        yield ("chanfirst", chanfirst_apply, p_x)
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
        if label in ("im2col", "chanfirst"):
            m_x, _ = build(False)
            ref = m_x.apply({"params": p}, x)
            got = apply_fn(p, x)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"{label} parity max abs err: {err:.2e}", flush=True)

        for comp, body in (("fwd", fwd), ("fwdbwd", fwdbwd)):
            dev, t16, t64 = kfit(scanner(body), (x,))
            print(f"{label}_{comp:7s}: {dev * 1e3:7.3f} ms/iter "
                  f"(K16 {t16 * 1e3:6.1f} ms, K64 {t64 * 1e3:6.1f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
