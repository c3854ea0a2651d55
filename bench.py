"""Benchmark: BOTH BASELINE.json workloads on one chip, ONE JSON line.

Primary metric: the fused DCGAN adversarial train step (the reference's
headline loop, dcgan/train.py:96-164) at its real shapes — batch 32, 64x64
frames, nc=4, ndf=ngf=64, float32 — ~9 forward/backward passes + 3 Adam
updates per batch fused into ONE XLA program.

The "extra" field carries the second BASELINE workload on the same terms:
the conv-GAT (temporal/conv, 43,936-param) fused train step at the
reference's geometry (20x20, T=4, V=6, batch 32).

Baselines ("vs_baseline"): BASELINE.json targets >= 5x a V100 running the
PyTorch reference. The reference publishes no steps/sec. Both reference
loops are DISPATCH-bound on a V100 (small convs / tiny GAT ops, eager
torch):

- dcgan: ~9 eager graph launches of small-batch convs+BN at ~2.5-3 ms
  each -> ~40 steps/sec estimate (generous), target 200.
- conv-GAT: ~240 kernel launches per step (4 heads x ~20 ops, fwd+bwd) at
  ~25 us each -> ~6 ms -> ~170 steps/sec; rounded generously to 200,
  target 1000.

Measured anchor (scripts/bench_torch_anchor.py, this host's 1-core CPU,
torch eager): dcgan 0.49 steps/sec, conv-GAT 0.94 steps/sec — the V100
estimates sit ~80-400x above the 1-core CPU measurement, consistent with
a dispatch-bound GPU. vs_baseline >= 1.0 means the 5x-V100 target is met.
"""

from __future__ import annotations

import json
import sys
import time

DCGAN_V100_ESTIMATE = 40.0
GAT_V100_ESTIMATE = 200.0
TARGET_MULTIPLIER = 5.0


def _time_step(step, states, args, key_seq, n_steps=50, trials=5):
    """Best-of-N trials of n chained donating steps (block once per trial)."""
    import jax

    states, logs = step(states, *args, key_seq.next())
    for _ in range(2):
        states, logs = step(states, *args, key_seq.next())
    jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            states, logs = step(states, *args, key_seq.next())
        jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
        best = min(best, time.perf_counter() - t0)
    return n_steps / best


def bench_dcgan():
    import numpy as np

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

    params = dict(DEFAULT_PARAMS)
    batch = 32  # the size train() actually uses (dcgan/train.py:241-248)
    mesh = MeshContext.create(data=1, model=1)  # single chip
    models, txs, states, _ = build_dcgan(params, precision="f32", seed=0)
    states = mesh.put_replicated(states)
    step = make_dcgan_train_step(*models, *txs)

    rng = np.random.RandomState(0)
    x = rng.rand(batch, 64, 64, 4).astype(np.float32)
    y = rng.rand(batch, 64, 64, 4).astype(np.float32)
    mask = np.ones(batch, np.float32)
    x, y, mask = mesh.put_batch(x, y, mask)
    return _time_step(step, states, (x, y, mask), KeySeq(0))


def bench_conv_gat():
    import jax.numpy as jnp
    import numpy as np

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.gat_trainer import make_gat_train_step
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    mesh = MeshContext.create(data=1, model=1)
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
    return _time_step(step, state, (x, y, m), ks)


def main():
    import jax

    print(f"platform: {jax.devices()[0].platform} "
          f"device: {jax.devices()[0]}", file=sys.stderr)

    dcgan_sps = bench_dcgan()
    print(f"fused dcgan step: {1e3 / dcgan_sps:.3f} ms/step",
          file=sys.stderr)
    gat_sps = bench_conv_gat()
    print(f"fused conv-GAT step: {1e3 / gat_sps:.3f} ms/step",
          file=sys.stderr)

    print(json.dumps({
        "metric": "dcgan_fused_adversarial_train_steps_per_sec_f32_b32",
        "value": round(dcgan_sps, 3),
        "unit": "steps/sec",
        "vs_baseline": round(
            dcgan_sps / (DCGAN_V100_ESTIMATE * TARGET_MULTIPLIER), 4),
        "extra": {
            "conv_gat_train_steps_per_sec_f32_b32": round(gat_sps, 3),
            "conv_gat_vs_baseline": round(
                gat_sps / (GAT_V100_ESTIMATE * TARGET_MULTIPLIER), 4),
        },
    }))


if __name__ == "__main__":
    main()
