"""Capture a jax.profiler trace of fused train steps.

Usage:
  python scripts/profile_step.py --workload dcgan --steps 20 \
      --trace-dir /tmp/egt_trace

Open the trace with TensorBoard's profile plugin / XProf / perfetto.
Also prints StepTimer wall-clock stats.
"""

# WARNING (round-3 finding, BENCH_NOTES): jax.block_until_ready does
# NOT block through the axon relay -- timings below are HOST DISPATCH
# rates on relay-attached rigs. bench.py (time-to-data drain) is the
# honest harness; this script's numbers are only comparable to each
# other on a locally-attached chip.

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workload", choices=("dcgan", "gat"),
                        default="dcgan")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--trace-dir", type=str, default="/tmp/egt_trace")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.utils.profiling import StepTimer, annotate, trace

    mesh = MeshContext.create(data=1)
    ks = KeySeq(0)
    rng = np.random.RandomState(0)

    if args.workload == "dcgan":
        from extended_gan_tpu.train.dcgan_driver import (
            DEFAULT_PARAMS,
            build_dcgan,
        )
        from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

        models, txs, states, _ = build_dcgan(dict(DEFAULT_PARAMS), seed=0)
        states = mesh.put_replicated(states)
        step = make_dcgan_train_step(*models, *txs)
        x, y, m = mesh.put_batch(
            rng.rand(args.batch, 64, 64, 4).astype(np.float32),
            rng.rand(args.batch, 64, 64, 4).astype(np.float32),
            np.ones(args.batch, np.float32),
        )

        def run(s):
            s, logs = step(s, x, y, m, ks.next())
            return s, logs
    else:
        from extended_gan_tpu.models.registry import build_model
        from extended_gan_tpu.train.gat_trainer import make_gat_train_step
        from extended_gan_tpu.train.optim import adam
        from extended_gan_tpu.train.state import create_net_state

        model = build_model("temporal", image_width=20, image_height=20,
                            n_vertices=6, mapping_type="conv")
        tx = adam(1e-3, weight_decay=0.01)
        state = create_net_state(model, tx, ks.next(),
                                 jnp.zeros((2, 20, 20, 4, 6)))
        state = mesh.put_replicated(state)
        gstep = make_gat_train_step(model, tx)
        x, y, m = mesh.put_batch(
            rng.rand(args.batch, 20, 20, 4, 6).astype(np.float32),
            rng.rand(args.batch, 20, 20, 4, 6).astype(np.float32),
            np.ones(args.batch, np.float32),
        )

        def run(s):
            return gstep(s, x, y, m, ks.next())

        states = state

    # warm up / compile outside the trace
    states, logs = run(states)
    jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])

    timer = StepTimer(warmup=1)
    with trace(args.trace_dir):
        for i in range(args.steps):
            with timer, annotate(f"step_{i}"):
                states, logs = run(states)
        jax.block_until_ready(jax.tree_util.tree_leaves(logs)[0])
    print("trace written to", args.trace_dir)
    print("wall-clock stats:", timer.stats())


if __name__ == "__main__":
    main()
