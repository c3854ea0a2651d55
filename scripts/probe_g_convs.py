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
it should win by several x if the util story is right. Numerics are
checked exactly (the extra terms multiply structural zeros).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


def pack2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); phase-major channel layout
    [(dy,dx)=(0,0)C, (0,1)C, (1,0)C, (1,1)C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H2, W2, dy, dx, C
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack2(xp):
    b, h2, w2, c4 = xp.shape
    c = c4 // 4
    x = xp.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def pack_weights(w):
    """(4, 4, Cin, Cout) stride-1 SAME(1,2) -> (3, 3, 4Cin, 4Cout) packed
    stride-1 SAME(1,1) producing the packed-layout output exactly.

    Output phase (py, px) at packed cell (i, j) is the original output
    pixel (2i+py, 2j+px) = sum over ky,kx of w[ky,kx] * x[2i+py+ky-1,
    2j+px+kx-1]. Writing the input pixel as packed cell (i+u, j+v) phase
    (qy, qx): 2(i+u)+qy = 2i+py+ky-1 => ky = 2u+qy-py+1 (and same in x).
    For ky in 0..3 and qy,py in 0..1, u ranges over {-1,0,1} -> 3 taps.
    """
    cin, cout = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for py in range(2):
        for px in range(2):
            for qy in range(2):
                for qx in range(2):
                    for u in range(-1, 2):
                        for v in range(-1, 2):
                            ky = 2 * u + qy - py + 1
                            kx = 2 * v + qx - px + 1
                            if 0 <= ky < 4 and 0 <= kx < 4:
                                wp[u + 1, v + 1,
                                   (2 * qy + qx) * cin:(2 * qy + qx + 1) * cin,
                                   (2 * py + px) * cout:(2 * py + px + 1) * cout] \
                                    = w[ky, kx]
    return jnp.asarray(wp)


def conv_packed(xp, wp):
    return jax.lax.conv_general_dilated(
        xp, wp, (1, 1), ((1, 1), (1, 1)),
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
        got = unpack2(conv_packed(pack2(x), pack_weights(np.asarray(w))))
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))

        t_d = timeit_scan(lambda x, c: jnp.mean(
            conv_same(x + c * 1e-9, w)), x)
        wp = pack_weights(np.asarray(w))
        xp = pack2(x)
        t_p = timeit_scan(lambda xp, c: jnp.mean(
            conv_packed(xp + c * 1e-9, wp)), xp)
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
