"""Extended benchmark suite (bench.py stays the driver's one-liner).

Measures, on the current backend:
- fused DCGAN adversarial train step, f32 and bf16, batch 32 and 128
- SmaAt-UNet forward, XLA vs fused-Pallas DSC path
- conv-GAT (temporal/conv) train step
- native vs numpy host-side batch materialization

Usage: python scripts/bench_all.py [--steps N]
"""

# WARNING (round-3 finding, BENCH_NOTES): jax.block_until_ready does
# NOT block through the axon relay -- timings below are HOST DISPATCH
# rates on relay-attached rigs. bench.py (time-to-data drain) is the
# honest harness; this script's numbers are only comparable to each
# other on a locally-attached chip.

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=30, warmup=3, chained=False, donate_cycle=None):
    import jax

    out = None
    state = args
    for _ in range(warmup):
        out = fn(*state)
        if donate_cycle is not None:
            state = donate_cycle(out, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*state)
        if donate_cycle is not None:
            state = donate_cycle(out, state)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def bench_dcgan(results, steps):
    import jax
    import numpy as np

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

    mesh = MeshContext.create(data=1)
    for precision in ("f32", "bf16"):
        for batch in (32, 128):
            models, txs, states, _ = build_dcgan(
                dict(DEFAULT_PARAMS), precision=precision, seed=0)
            states = mesh.put_replicated(states)
            step = make_dcgan_train_step(*models, *txs)
            rng = np.random.RandomState(0)
            x, y, m = mesh.put_batch(
                rng.rand(batch, 64, 64, 4).astype(np.float32),
                rng.rand(batch, 64, 64, 4).astype(np.float32),
                np.ones(batch, np.float32),
            )
            ks = KeySeq(0)

            # step donates its state arg: thread the returned state back
            # in (re-passing a donated buffer is invalid)
            dt = timeit(
                lambda s: step(s, x, y, m, ks.next())[0], states,
                steps=steps, warmup=4,
                donate_cycle=lambda out, args: (out,),
            )
            key = f"dcgan_step_{precision}_b{batch}"
            results[key] = {
                "ms_per_step": round(dt * 1e3, 3),
                "steps_per_sec": round(1 / dt, 1),
                "frames_per_sec": round(batch / dt, 1),
            }
            print(key, results[key], flush=True)


def bench_unet(results, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from extended_gan_tpu.models.smaat_unet import SmaAt_UNet

    x = jnp.asarray(np.random.RandomState(0).rand(8, 64, 64, 4), jnp.float32)
    m_x = SmaAt_UNet(kernels_per_layer=2, use_pallas=False)
    m_p = SmaAt_UNet(kernels_per_layer=2, use_pallas=True)
    v = jax.jit(lambda k: m_x.init(k, x, train=False))(jax.random.PRNGKey(0))
    for name, m in (("xla", m_x), ("pallas", m_p)):
        f = jax.jit(lambda v, x, m=m: m.apply(v, x, train=False))
        dt = timeit(f, v, x, steps=steps, warmup=3)
        results[f"smaat_unet_fwd_b8_{name}"] = {
            "ms": round(dt * 1e3, 3)}
        print(f"smaat_unet_fwd_b8_{name}", results[f"smaat_unet_fwd_b8_{name}"],
              flush=True)


def bench_gat(results, steps):
    import jax.numpy as jnp
    import numpy as np

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.gat_trainer import make_gat_train_step
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    mesh = MeshContext.create(data=1)
    model = build_model("temporal", image_width=20, image_height=20,
                        n_vertices=6, mapping_type="conv")
    tx = adam(1e-3, weight_decay=0.01)
    ks = KeySeq(0)
    state = create_net_state(model, tx, ks.next(),
                             jnp.zeros((2, 20, 20, 4, 6)))
    state = mesh.put_replicated(state)
    step = make_gat_train_step(model, tx)
    rng = np.random.RandomState(0)
    x, y, m = mesh.put_batch(
        rng.rand(32, 20, 20, 4, 6).astype(np.float32),
        rng.rand(32, 20, 20, 4, 6).astype(np.float32),
        np.ones(32, np.float32),
    )
    dt = timeit(lambda s: step(s, x, y, m, ks.next())[0], state,
                steps=steps, warmup=4,
                donate_cycle=lambda out, args: (out,))
    results["conv_gat_step_f32_b32"] = {
        "ms_per_step": round(dt * 1e3, 3),
        "steps_per_sec": round(1 / dt, 1),
    }
    print("conv_gat_step_f32_b32", results["conv_gat_step_f32_b32"],
          flush=True)


def bench_native(results):
    import numpy as np

    from extended_gan_tpu.data import native

    rng = np.random.RandomState(0)
    video = rng.randint(0, 255, size=(512, 6, 80, 80)).astype(np.float32)
    starts = np.arange(128, dtype=np.int64)
    native.kmni_make_batch(video, starts, steps=4, crop=80)
    t0 = time.perf_counter()
    for _ in range(10):
        native.kmni_make_batch(video, starts, steps=4, crop=80)
    t_native = (time.perf_counter() - t0) / 10
    lib, native._lib, native._lib_failed = native._lib, None, True
    t0 = time.perf_counter()
    for _ in range(3):
        native.kmni_make_batch(video, starts, steps=4, crop=80)
    t_numpy = (time.perf_counter() - t0) / 3
    native._lib, native._lib_failed = lib, False
    results["native_kmni_batch_b128"] = {
        "native_ms": round(t_native * 1e3, 2),
        "numpy_ms": round(t_numpy * 1e3, 2),
        "speedup": round(t_numpy / t_native, 2),
    }
    print("native_kmni_batch_b128", results["native_kmni_batch_b128"],
          flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--out", type=str, default="")
    parser.add_argument("--skip", nargs="*", default=[])
    args = parser.parse_args()

    import jax

    results: dict = {"platform": jax.devices()[0].platform}
    print("platform:", results["platform"], flush=True)
    if "native" not in args.skip:
        bench_native(results)
    if "gat" not in args.skip:
        bench_gat(results, args.steps)
    if "unet" not in args.skip:
        bench_unet(results, args.steps)
    if "dcgan" not in args.skip:
        bench_dcgan(results, args.steps)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
