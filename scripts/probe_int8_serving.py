"""Generator-ONLY serving device time: f32 vs bf16 vs int8 PTQ modes.

The v5e MXU executes int8 x int8 -> int32 contractions at twice its bf16
rate, so w8a8 (serve/quantize.py) is the candidate fastest serving path —
IF the generator's small-channel convs are MXU-bound enough to cash the
rate in, and IF the per-layer quantize/dequantize round trips (round,
clip, cast, rescale — pure VPU work) cost less than the MXU time they
save. The packed_g episode (probe_packed_serving.py) showed exactly this
composition risk, so the verdict must be measured end-to-end, not
inferred from the MXU datasheet.

Protocol (same as probe_packed_serving.py): a K-chain of inference
applications y <- G(y) (the sigmoid head keeps outputs in the [0,1] input
domain, so the chain stays calibrated), forced serial by data dependence,
timed to data (scalar device_get), two-K fit — slope = true device ms per
application, intercept = link overhead.

Modes: model (unfolded Generator.apply — what the pre-quantization
export serves), f32 (BN-folded f32), bf16 (folded, bf16 operands),
w8 (weight-only int8, f32 compute), w8a8 (full int8 convs, int32
accumulation).

RESULT (2026-08-18, v5e via relay, 2-3 repeated sessions per point,
ms/application by two-K fit):

| mode  | b32 (range)   | b128 (range)  |
|---|---|---|
| model | 0.280 - 0.359 | 0.257 - 0.282 |
| f32   | 0.315 - 0.352 | 0.251 - 0.260 |
| bf16  | 0.310 - 0.376 | 0.253 - 0.266 |
| w8    | 0.310 - 0.375 | 0.210 - 0.213 |
| w8a8  | 0.340 - 0.422 | 0.184 - 0.208 |

Verdict: at b32 the chain is serial-latency-bound and every variant
sits inside the relay's run-to-run spread — NEUTRAL, same physics as
the packed_g serving finding (small-channel convs starve the MXU
regardless of operand width). At b128 the convs are fat enough for
operand width to matter and int8 separates cleanly from the float
modes: **w8 ~1.22x and w8a8 ~1.25-1.4x vs the folded-f32 path**
(w8a8 best single fit 0.184 ms/app = ~697k samples/s). int8 PTQ is a
real batch-serving win on this model and the 4x weight-bytes cut in
the artifact comes with it; at interactive batch sizes it is free but
not faster. Full record: BENCH_NOTES "int8 PTQ serving".

Usage: python scripts/probe_int8_serving.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from extended_gan_tpu.serve.quantize import (
        fold_generator_bn,
        folded_apply,
        make_quantized_generator,
    )
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.RandomState(0)
    print(f"batch={batch} backend={jax.default_backend()}", flush=True)

    models, _, states, _ = build_dcgan(dict(DEFAULT_PARAMS), seed=0)
    variables = {"params": states.g.params,
                 "batch_stats": states.g.batch_stats}
    x0 = jnp.asarray(rng.rand(batch, 64, 64, 4), jnp.float32)
    g_model = models[0]

    def unfolded_fwd(x):
        return g_model.apply(variables, x, train=False)

    layers = fold_generator_bn(variables)

    def f32_fwd(x):
        return folded_apply(layers, x)

    def bf16_fwd(x):
        return folded_apply(layers, x, dtype=jnp.bfloat16)

    w8_fwd, _ = make_quantized_generator(variables, mode="w8")
    w8a8_fwd, _ = make_quantized_generator(variables, mode="w8a8",
                                           calib_x=x0)

    results = {}
    for name, fwd in (("model", unfolded_fwd), ("f32", f32_fwd),
                      ("bf16", bf16_fwd), ("w8", w8_fwd),
                      ("w8a8", w8a8_fwd)):
        def chain(x, K, fwd=fwd):
            def body(y, _):
                return fwd(y), None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return y

        per_k = {}
        for K in (16, 64):
            run = jax.jit(lambda x, K=K: chain(x, K))
            y = run(x0)
            float(jax.device_get(y.ravel()[-1]))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                y = run(x0)
                float(jax.device_get(y.ravel()[-1]))  # time-to-data
                best = min(best, time.perf_counter() - t0)
            per_k[K] = best
            print(f"  {name:5s} K={K}: {best * 1e3:8.2f} ms "
                  f"({best / K * 1e3:6.3f} ms/app raw)", flush=True)
        slope = (per_k[64] - per_k[16]) / 48.0
        results[name] = slope
        print(f"  {name:5s}: device {slope * 1e3:.3f} ms/application "
              f"({batch / slope:.0f} samples/s)", flush=True)

    for name in ("f32", "bf16", "w8", "w8a8"):
        print(f"speedup {name} vs unfolded model.apply: "
              f"{results['model'] / results[name]:.2f}x")


if __name__ == "__main__":
    main()
