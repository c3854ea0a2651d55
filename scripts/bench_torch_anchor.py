"""Measured torch-on-CPU anchor for the vs_baseline estimates.

BASELINE.json's >=5x target is against a V100 running the torch reference;
no GPU exists here, so bench.py uses a documented V100 estimate. This
script grounds that estimate with a MEASURED number: the reference training
algorithms (as torch code — the same twins the e2e parity tests run)
timed on this host's CPU. A V100 is bounded by eager dispatch overhead on
these small models, so CPU-measured dispatch-bound steps/sec is a sane
lower anchor: the V100 estimate must sit between this number and the
all-compute-free dispatch ceiling.

Run: python scripts/bench_torch_anchor.py  (pure CPU, no TPU involved)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import torch

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "tests")
)
from test_e2e_torch_parity import (  # noqa: E402
    TorchFrameDiscriminator,
    TorchGAT3D,
    TorchGenerator,
    TorchTemporalDiscriminator,
    t_,
)


def bench_torch_dcgan(batch=32, ndf=64, steps=10):
    """One reference adversarial step (dcgan/train.py:96-164), eager torch."""
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

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return steps / (time.perf_counter() - t0)


def bench_torch_gat(batch=32, hw=20, steps=20):
    """One reference conv-GAT step (convolutional_gat/train.py:125-139)."""
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

    one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return steps / (time.perf_counter() - t0)


if __name__ == "__main__":
    out = {
        "torch_cpu_dcgan_steps_per_sec_b32": round(bench_torch_dcgan(), 2),
        "torch_cpu_conv_gat_steps_per_sec_b32": round(bench_torch_gat(), 2),
        "cpu_count": os.cpu_count(),
    }
    print(json.dumps(out))
