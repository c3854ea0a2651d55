"""conv-GAT internal-layout evaluation (ROADMAP perf item).

The public contract keeps activations as (B, H, W, T, V) — V=6 rides the
minor (lane) axis, so a naive TPU tiling pads (T=4, V=6) -> (8, 128), a
~42x register/tile blowup for elementwise work. This script measures, on
the real chip, whether that layout actually costs wall-clock at the two
experiment geometries (20x20 local_*, 80x80 final_*):

1. elementwise (elu) on (B,H,W,T,V) vs transposed (B,T,V,H,W),
2. the temporal attention mix einsum in both layouts,
3. the full fused train step (the end-to-end referee).

Run: python scripts/bench_gat_layout.py
"""

# WARNING (round-3 finding, BENCH_NOTES): jax.block_until_ready does
# NOT block through the axon relay -- timings below are HOST DISPATCH
# rates on relay-attached rigs. bench.py (time-to-data drain) is the
# honest harness; this script's numbers are only comparable to each
# other on a locally-attached chip.

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    results = {}
    for (b, hw) in ((32, 20), (8, 80)):
        t, v = 4, 6
        rng = np.random.RandomState(0)
        x_hwtv = jnp.asarray(rng.rand(b, hw, hw, t, v), jnp.float32)
        x_tvhw = jnp.asarray(x_hwtv.transpose(0, 3, 4, 1, 2))
        att = jnp.asarray(rng.rand(b, t, t), jnp.float32)

        elu_a = jax.jit(jax.nn.elu)
        elu_b = jax.jit(jax.nn.elu)
        results[f"elu_hwtv_b{b}_{hw}"] = timeit(elu_a, x_hwtv)
        results[f"elu_tvhw_b{b}_{hw}"] = timeit(elu_b, x_tvhw)

        hp = jax.lax.Precision.HIGHEST
        mix_a = jax.jit(lambda a, m: jnp.einsum(
            "bts,bhwsv->bhwtv", a, m, precision=hp))
        mix_b = jax.jit(lambda a, m: jnp.einsum(
            "bts,bsvhw->btvhw", a, m, precision=hp))
        results[f"mix_hwtv_b{b}_{hw}"] = timeit(mix_a, att, x_hwtv)
        results[f"mix_tvhw_b{b}_{hw}"] = timeit(mix_b, att, x_tvhw)

        # chained: 8 rounds of mix+elu, amortizing dispatch so the layout
        # effect (if any) dominates
        def chain(a, m, mix_expr):
            def body(m, _):
                m = jnp.einsum(mix_expr, a, m, precision=hp)
                return jax.nn.elu(m), ()
            out, _ = jax.lax.scan(body, m, None, length=8)
            return out

        ch_a = jax.jit(lambda a, m: chain(a, m, "bts,bhwsv->bhwtv"))
        ch_b = jax.jit(lambda a, m: chain(a, m, "bts,bsvhw->btvhw"))
        results[f"chain8_hwtv_b{b}_{hw}"] = timeit(ch_a, att, x_hwtv)
        results[f"chain8_tvhw_b{b}_{hw}"] = timeit(ch_b, att, x_tvhw)

    for k, val in results.items():
        print(f"{k:28s} {val * 1e3:8.3f} ms")
    print()
    for (b, hw) in ((32, 20), (8, 80)):
        for op in ("elu", "mix", "chain8"):
            a = results[f"{op}_hwtv_b{b}_{hw}"]
            bb = results[f"{op}_tvhw_b{b}_{hw}"]
            print(f"{op} b{b} {hw}x{hw}: transposed layout speedup "
                  f"{a / bb:.2f}x (hwtv {a*1e3:.3f} ms -> tvhw "
                  f"{bb*1e3:.3f} ms; >1 means tvhw faster)")


if __name__ == "__main__":
    main()
