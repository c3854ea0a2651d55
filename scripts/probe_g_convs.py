"""Per-conv timing of the dcgan Generator + space-to-depth potential.

The decomposition probe (probe_dcgan_decomp.py) shows the generator is
~60% of the fused step's device time despite ~10x fewer FLOPs than the
discriminators: five stride-1 SAME 4x4 convs at full 64x64 resolution
with 4..32 channels leave the 128-lane MXU nearly idle.

This probe times (a) each G conv alone, (b) a space-to-depth (2x2
packed) equivalent: x[64,64,C] -> xp[32,32,4C], w[4,4,Cin,Cout] ->
wp[3,3,4Cin,4Cout], conv SAME-on-packed == phase-interleaved original
output. The packed kernel does ~2.25x the MACs (3x3 packed window
covers 6x6 pixels vs 4x4) but fills the contraction and lane dims, so
it should win if the util story is right. Numerics are checked exactly
(the extra terms multiply structural zeros).

Measured verdict (v5e via relay, f32 b32): per-conv 1.2-1.5x, but
pack2/unpack2 (~0.165 ms/application) eat most of it at forward
granularity — recorded in ops/space_to_depth.py, which now owns the
packing transforms this probe imports.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.ops.space_to_depth import (
    pack2,
    pack_conv_weights,
    packed_conv_same,
    unpack2,
)


def _timeit_scan_fixed_k(body, x, K, n_programs=8, trials=3):
    @jax.jit
    def run(x):
        def sbody(c, _):
            return body(x, c), None
        out, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=K)
        return out

    out = run(x)
    np.asarray(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_programs):
            out = run(x)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n_programs)
    return best


def timeit_scan(body, x):
    """K-fit (K=16 vs K=64): slope = true device time per iteration.
    A single-K divide would smear the relay's ~4 ms per-program overhead
    into a fake ~0.06 ms per-op floor."""
    t16 = _timeit_scan_fixed_k(body, x, 16)
    t64 = _timeit_scan_fixed_k(body, x, 64)
    return (t64 - t16) / 48.0


def conv_same(x, w):
    # flax SAME for even kernels: pad (lo=1, hi=2) each spatial dim
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    batch = 32
    rng = np.random.RandomState(0)
    widths = [(4, 32), (32, 16), (16, 8), (8, 4), (4, 4)]
    print(f"batch={batch} 64x64 f32, per-conv device ms (K=64 scan):")
    tot_d = tot_p = 0.0
    for cin, cout in widths:
        x = jnp.asarray(rng.rand(batch, 64, 64, cin), jnp.float32)
        w = jnp.asarray(rng.randn(4, 4, cin, cout) * 0.05, jnp.float32)

        # numerics check: packed == direct (exact zeros padding)
        ref = conv_same(x, w)
        got = unpack2(packed_conv_same(pack2(x), pack_conv_weights(w)))
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))

        t_d = timeit_scan(lambda x, c: jnp.mean(
            conv_same(x + c * 1e-9, w)), x)
        wp = pack_conv_weights(w)
        xp = pack2(x)
        t_p = timeit_scan(lambda xp, c: jnp.mean(
            packed_conv_same(xp + c * 1e-9, wp)), xp)
        tot_d += t_d
        tot_p += t_p
        print(f"  {cin:3d}->{cout:3d}: direct {t_d*1e3:7.4f} ms, "
              f"packed {t_p*1e3:7.4f} ms ({t_d/t_p:4.1f}x), "
              f"max|err| {err:.2e} (scale {scale:.1f})", flush=True)
    print(f"  total    : direct {tot_d*1e3:.4f} ms, packed {tot_p*1e3:.4f}"
          f" ms ({tot_d/tot_p:.1f}x) -- excludes pack/unpack (done once "
          f"per net, not per conv)")

    # pack/unpack cost when amortized over the whole net
    x = jnp.asarray(rng.rand(batch, 64, 64, 4), jnp.float32)
    t_pack = timeit_scan(lambda x, c: jnp.mean(pack2(x + c * 1e-9)), x)
    xp = pack2(x)
    t_unpack = timeit_scan(lambda xp, c: jnp.mean(unpack2(xp + c * 1e-9)),
                           xp)
    print(f"  pack2 {t_pack*1e3:.4f} ms, unpack2 {t_unpack*1e3:.4f} ms")


if __name__ == "__main__":
    main()
