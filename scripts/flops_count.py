"""Per-step FLOPs / bytes for the two BASELINE workloads, from XLA.

Compiles the SAME fused train steps bench.py times — at the same shapes
(b32, f32) — for the CPU backend and reads XLA's cost analysis. FLOPs are
backend-independent arithmetic counts of the algorithm (fwd + bwd + Adam);
"bytes accessed" is the FUSED program's HBM traffic (an eager program
touches strictly more). Used by:

- scripts/derive_v100_baseline.py — the V100 denominator derivation;
- bench.py — the MFU / achieved-TF/s fields (via the pinned values in
  BASELINE_DERIVATION.json, re-derived by tests/test_bench_derivation.py).

Run: python scripts/flops_count.py   (pure CPU; never touches the TPU
relay — AOT cost analysis through the axon relay corrupts the session,
BENCH_NOTES round-2 methodology note.)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _cost(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returned [dict]
        ca = ca[0]
    return {"flops": float(ca["flops"]),
            "bytes_accessed": float(ca["bytes accessed"])}


def dcgan_step_cost(batch: int = 32) -> dict:
    import jax
    import numpy as np

    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )
    from extended_gan_tpu.train.dcgan_trainer import make_dcgan_train_step

    mesh = MeshContext.create(data=1, model=1)
    models, txs, states, _ = build_dcgan(
        dict(DEFAULT_PARAMS), precision="f32", seed=0)
    states = mesh.put_replicated(states)
    step = make_dcgan_train_step(*models, *txs)
    rng = np.random.RandomState(0)
    x, y, m = mesh.put_batch(
        rng.rand(batch, 64, 64, 4).astype(np.float32),
        rng.rand(batch, 64, 64, 4).astype(np.float32),
        np.ones(batch, np.float32),
    )
    return _cost(step.lower(states, x, y, m, jax.random.PRNGKey(0)).compile())


def gat_step_cost(batch: int = 32) -> dict:
    import jax
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
        rng.rand(batch, 20, 20, 4, 6).astype(np.float32),
        rng.rand(batch, 20, 20, 4, 6).astype(np.float32),
        np.ones(batch, np.float32),
    )
    return _cost(step.lower(state, x, y, m, ks.next()).compile())


def derive_costs(batches: tuple[int, ...] = (32,)) -> dict:
    """Per-workload costs; batch sizes beyond 32 land under
    ``<workload>_b<N>`` keys (the b128 rows back the composed
    megastep-K64-b128-bf16 bench mode's matched-batch baseline)."""
    _force_cpu()
    out = {}
    for b in batches:
        suffix = "" if b == 32 else f"_b{b}"
        out[f"dcgan{suffix}"] = dcgan_step_cost(b)
        out[f"conv_gat{suffix}"] = gat_step_cost(b)
    return out


if __name__ == "__main__":
    print(json.dumps(derive_costs(), indent=2))
