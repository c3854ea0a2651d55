"""DERIVE (not guess) the V100 reference-baseline steps/sec for bench.py.

BASELINE.json's target is ">= 5x a V100 running the PyTorch reference".
No V100 exists here and the reference commits no timing artifacts, so the
denominator must be modeled. Round 2 pinned reasoned-but-asserted numbers
(40 / 200 steps/sec); this script replaces them with an instrumented
derivation (round-2 VERDICT item 1b). Three measured/derived inputs:

1. **Kernel-launch count** ``N``: run the SAME torch twins the e2e parity
   tests validate (one full reference train step: dcgan/train.py:96-164
   resp. convolutional_gat/train.py:125-139) under torch.profiler and
   count leaf aten ops that launch device work — metadata-only ops
   (empty/view/as_strided/reshape/transpose/...) are excluded, so ``N``
   UNDER-counts CUDA launches (CUDA also splits reductions and backward
   convs into several kernels), which makes the modeled V100 faster =
   generous to the reference.
2. **FLOPs** ``F``: XLA cost analysis of our fused step implementing the
   identical math at identical shapes (scripts/flops_count.py, CPU
   backend) — backend-independent arithmetic counts.
3. **Bytes** ``B``: the fused program's "bytes accessed" from the same
   cost analysis. An eager program materializes every intermediate in HBM
   and touches strictly MORE bytes, so ``B`` is a lower bound = generous.

The eager V100 step is modeled with published V100 figures (15.7 TF/s
fp32 peak, 900 GB/s HBM2) and a per-op CPU-side issue cost (eager
PyTorch dispatcher + autograd bookkeeping, commonly measured at 10-30 us
per op; bare cudaLaunchKernel latency is ~5 us):

  conservative: t = N*20us + F/(0.5*peak) + B/(0.7*bw)   (fully serial)
  central:      t = N*10us + max(F/(0.7*peak), B/(0.8*bw))
  generous:     t = max(N*5us, F/peak, B/bw)
    (a V100 that issues ops at bare-driver speed, overlaps issue with
     execution perfectly, and hits 100% of peak on every small-batch
     kernel — an unreachable upper bound for an eager program)

bench.py consumes the committed output (BASELINE_DERIVATION.json): its
`vs_baseline` divides by 5x the CENTRAL estimate, and the extras carry
`vs_baseline_generous` so the claim can be audited under the reference's
most favorable assumptions. tests/test_bench_derivation.py re-derives the
FLOPs to keep the pinned numbers honest.

Run: python scripts/derive_v100_baseline.py            (pure CPU)
     python scripts/derive_v100_baseline.py --write    (refresh the JSON)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "tests")
)

import numpy as np
import torch

# published V100 figures (NVIDIA V100 datasheet; SXM2 variant)
V100_PEAK_FLOPS = 15.7e12   # fp32 FMA peak
V100_PEAK_BW = 900e9        # HBM2 bandwidth

# aten ops that only manipulate metadata / allocate — no device kernel
_NO_KERNEL = {
    "aten::empty", "aten::empty_like", "aten::empty_strided",
    "aten::resize_", "aten::as_strided", "aten::as_strided_",
    "aten::view", "aten::_unsafe_view", "aten::reshape", "aten::alias",
    "aten::detach", "aten::detach_", "aten::t", "aten::transpose",
    "aten::permute", "aten::expand", "aten::expand_as", "aten::squeeze",
    "aten::unsqueeze", "aten::narrow", "aten::slice", "aten::select",
    "aten::split", "aten::chunk", "aten::broadcast_tensors",
    "aten::result_type", "aten::to", "aten::lift_fresh",
    "aten::numel", "aten::size", "aten::stride", "aten::is_complex",
    "aten::conj", "aten::real", "aten::set_",
}
# device->host syncs (.item()): not kernels, but each stalls the eager
# pipeline for >= a launch latency — counted as one issue slot
_SYNC = {"aten::_local_scalar_dense", "aten::item"}


def _count_kernel_ops(one_step) -> dict:
    """Leaf-aten-op census of ONE training step."""
    from torch.profiler import ProfilerActivity, profile

    one_step()  # warmup: autograd graph + backend caches built
    with profile(activities=[ProfilerActivity.CPU]) as prof:
        one_step()
    kernels: dict[str, int] = {}
    n_sync = 0
    for evt in prof.events():
        if evt.cpu_children:  # composite wrapper (e.g. aten::convolution)
            continue
        name = evt.name
        if not name.startswith("aten::"):
            continue
        if name in _NO_KERNEL:
            continue
        if name in _SYNC:
            n_sync += 1
            continue
        kernels[name] = kernels.get(name, 0) + 1
    return {"n_kernel_ops": sum(kernels.values()), "n_syncs": n_sync,
            "by_op": dict(sorted(kernels.items(), key=lambda kv: -kv[1]))}


def _model_v100(n_issue: int, flops: float, bytes_: float) -> dict:
    t_flops = lambda eff: flops / (V100_PEAK_FLOPS * eff)  # noqa: E731
    t_bw = lambda eff: bytes_ / (V100_PEAK_BW * eff)  # noqa: E731
    scen = {
        "conservative": n_issue * 20e-6 + t_flops(0.5) + t_bw(0.7),
        "central": n_issue * 10e-6 + max(t_flops(0.7), t_bw(0.8)),
        "generous": max(n_issue * 5e-6, t_flops(1.0), t_bw(1.0)),
    }
    return {
        name: {"t_step_ms": round(t * 1e3, 3),
               "steps_per_sec": round(1.0 / t, 1)}
        for name, t in scen.items()
    }


def _dcgan_step(batch: int = 32):
    """== the reference adversarial step, same twins as the parity tests."""
    from test_e2e_torch_parity import (
        TorchFrameDiscriminator,
        TorchGenerator,
        TorchTemporalDiscriminator,
        t_,
    )

    ndf = 64
    tg, tfd, ttd = (TorchGenerator(4), TorchFrameDiscriminator(4, ndf),
                    TorchTemporalDiscriminator(4, ndf))
    crit = torch.nn.BCELoss()
    opts = [torch.optim.Adam(m.parameters(), lr=2e-4, betas=(0.5, 0.999))
            for m in (tg, tfd, ttd)]
    rng = np.random.RandomState(0)
    x = t_(rng.rand(batch, 4, 64, 64))
    y = t_(rng.rand(batch, 4, 64, 64))
    real, fake_l = torch.ones(batch), torch.zeros(batch)

    def one_step():
        ttd.zero_grad(), tfd.zero_grad()
        crit(tfd(y), real).backward()
        crit(ttd(torch.cat((x, y), 1)), real).backward()
        fake = tg(x)
        fd_ = fake.detach()
        crit(tfd(fd_), fake_l).backward()
        crit(ttd(torch.cat((x, fd_), 1)), fake_l).backward()
        opts[1].step(), opts[2].step()
        tg.zero_grad()
        (crit(tfd(fake).view(-1), real)
         + crit(ttd(torch.cat((x, fake), 1)).view(-1), real)).backward()
        opts[0].step()

    return one_step


def _gat_step(batch: int = 32):
    """== the reference conv-GAT step (temporal/conv, 43,936 params)."""
    from test_e2e_torch_parity import TorchGAT3D, t_

    hw = 20
    model = TorchGAT3D(4, 6)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=0.01)
    crit = torch.nn.MSELoss()
    rng = np.random.RandomState(0)
    x = t_(rng.rand(batch, hw, hw, 4, 6))
    y = t_(rng.rand(batch, hw, hw, 4, 6))

    def one_step():
        opt.zero_grad()
        y_hat = model(x)
        loss = crit(y_hat, y) - 0.0005 * (torch.sum(y_hat) / y_hat.numel())
        loss.backward()
        opt.step()

    return one_step


def derive(costs: dict | None = None) -> dict:
    if costs is None:
        from flops_count import derive_costs

        # b32 = the headline shapes; b128 backs the composed
        # megastep-K64-b128-bf16 bench mode's MATCHED-BATCH baseline
        costs = derive_costs(batches=(32, 128))
    result = {}
    for workload, make in (
        ("dcgan", _dcgan_step), ("conv_gat", _gat_step),
        ("dcgan_b128", lambda: _dcgan_step(128)),
        ("conv_gat_b128", lambda: _gat_step(128)),
    ):
        if workload not in costs:
            continue
        census = _count_kernel_ops(make())
        n_issue = census["n_kernel_ops"] + census["n_syncs"]
        flops = costs[workload]["flops"]
        bytes_ = costs[workload]["bytes_accessed"]
        result[workload] = {
            "kernel_ops_per_step": census["n_kernel_ops"],
            "syncs_per_step": census["n_syncs"],
            "flops_per_step": flops,
            "fused_bytes_accessed": bytes_,
            "v100_model": _model_v100(n_issue, flops, bytes_),
            "top_ops": dict(list(census["by_op"].items())[:10]),
        }
    result["model"] = {
        "v100_peak_flops": V100_PEAK_FLOPS,
        "v100_peak_bw": V100_PEAK_BW,
        "scenarios": {
            "conservative": "N*20us + F/(0.5*peak) + B/(0.7*bw), serial",
            "central": "N*10us + max(F/(0.7*peak), B/(0.8*bw))",
            "generous": "max(N*5us, F/peak, B/bw) — unreachable eager "
                        "upper bound",
        },
        "inputs": "N: torch.profiler leaf-op census of the e2e-parity "
                  "torch twins (metadata ops excluded; under-counts CUDA "
                  "kernels = generous). F, B: XLA cost analysis of the "
                  "identical fused math (scripts/flops_count.py); B is a "
                  "lower bound on eager traffic = generous.",
    }
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write BASELINE_DERIVATION.json at the repo root")
    args = ap.parse_args()
    res = derive()
    print(json.dumps(res, indent=2))
    if args.write:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE_DERIVATION.json")
        with open(path, "w") as f:
            json.dump(res, f, indent=2)
        print(f"wrote {path}", file=sys.stderr)
