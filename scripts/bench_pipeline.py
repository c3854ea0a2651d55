"""Input-pipeline benchmark: host loader rates vs chip-feeding steps/sec.

Round-2 VERDICT item 2: "the bench never touches the real input
pipeline". bench.py's `pipeline_fed` extras carry the two headline rows
(driver-captured every round); this script is the fuller sweep for
BENCH_NOTES — per-geometry loader-only host rates, pipeline-fed fused-step
rates, and the device-resident ceiling, so any gap can be attributed to
(a) the loader, (b) the host->device link, or (c) the chip.

Geometries (reference shapes):
- conv-GAT 20x20 b32  (local_* experiments; 80x80 int16 archive cropped)
- conv-GAT 80x80 b8   (final_temp_conv geometry)
- KNMI merge_nodes mosaic (160x240 b8) — loader-only (the reference's
  merged 2x3 layout, kmni_data_loader.py:96-106)
- DCGAN h5 64x64 b32  (dcgan/train.py shapes)

Run: python scripts/bench_pipeline.py   (real chip or CPU; keep the host
otherwise idle — on a 1-core host ANY concurrent process inflates every
number ~2x)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared setups)


def loader_only(it, n_batches: int) -> float:
    """Batches/sec of a warm loader iterator (pure host work)."""
    next(it)
    n = 0
    t0 = time.perf_counter()
    for _ in it:
        n += 1
        if n >= n_batches:
            break
    return n / (time.perf_counter() - t0)


def main():
    from extended_gan_tpu.data.streaming import get_h5_loaders, get_loaders
    from extended_gan_tpu.data.synthetic import (
        ensure_synthetic_h5,
        ensure_synthetic_kmni,
    )

    results: dict = {}

    # ---------------- conv-GAT 20x20 b32
    folder = ensure_synthetic_kmni(None, n_train_files=8,
                                   frames_per_file=116, n_test_files=1,
                                   hw=80)
    tl, _, _ = get_loaders(32, 32, folder, None, dataset="kmni",
                           downsample_size=(20, 20), merge_nodes=False,
                           shuffle=True, seed=1)
    results["gat20_loader_batches_per_sec"] = round(
        loader_only(iter(tl), 25), 1)
    ceiling = bench.bench_conv_gat(batch=32, hw=20)
    results["gat20_device_resident_sps"] = round(ceiling["median"], 1)
    piped = bench.bench_gat_pipeline(batch=32, n_steps=25, hw=20)
    results["gat20_pipeline_fed_sps"] = round(piped, 1)
    results["gat20_pipeline_vs_ceiling"] = round(
        piped / ceiling["median"], 3)

    # ---------------- conv-GAT 80x80 b8 (final_temp_conv geometry)
    tl, _, _ = get_loaders(8, 8, folder, None, dataset="kmni",
                           downsample_size=(80, 80), merge_nodes=False,
                           shuffle=True, seed=1)
    results["gat80_loader_batches_per_sec"] = round(
        loader_only(iter(tl), 25), 1)
    ceiling = bench.bench_conv_gat(batch=8, hw=80)
    results["gat80_device_resident_sps"] = round(ceiling["median"], 1)
    piped = bench.bench_gat_pipeline(batch=8, n_steps=25, hw=80)
    results["gat80_pipeline_fed_sps"] = round(piped, 1)
    results["gat80_pipeline_vs_ceiling"] = round(
        piped / ceiling["median"], 3)

    # ---------------- KNMI mosaic (merge_nodes) loader-only
    tl, _, _ = get_loaders(8, 8, folder, None, dataset="kmni",
                           downsample_size=(80, 80), merge_nodes=True,
                           shuffle=True, seed=1)
    results["mosaic_loader_batches_per_sec"] = round(
        loader_only(iter(tl), 25), 1)

    # ---------------- DCGAN h5 64x64 b32
    d = ensure_synthetic_h5(None, frames_train=1330, frames_test=16,
                            h=64, w=64)
    tl, _ = get_h5_loaders(d, 32, 32, crop=64, in_seq_len=4,
                           out_seq_len=4, seed=1)
    results["dcgan_loader_batches_per_sec"] = round(
        loader_only(iter(tl), 40), 1)
    ceiling = bench.bench_dcgan(batch=32)
    results["dcgan_device_resident_sps"] = round(ceiling["median"], 1)
    piped = bench.bench_dcgan_pipeline(batch=32, n_steps=40)
    results["dcgan_pipeline_fed_sps"] = round(piped, 1)
    results["dcgan_pipeline_vs_ceiling"] = round(
        piped / ceiling["median"], 3)

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
