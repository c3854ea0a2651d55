"""Probe: does Switch-MoE capacity pay off on a HETEROGENEOUS archive?

Round-3's dense-vs-E=4 A/B (BENCH_NOTES "Switch-MoE bottleneck") ran on
single-regime synthetic KNMI, leaving the stated motivation — storm vs
drizzle inputs routing to different experts — untested. This probe closes
that (VERDICT round 3, next-round item 7):

1. generates a mixed-regime archive (data/synthetic.py REGIMES: "storm" =
   few intense fast large cells, "drizzle" = many faint static small
   cells; files alternate regimes),
2. trains dense vs ``moe_experts=4`` SmaAt-UNet through the PRODUCT path
   (train.gat_driver.train — same seed, same steps, same data order),
3. reports best/final val_loss overall and per pure-regime eval set,
4. for the MoE run, applies the trained model per regime with
   ``mutable=["routing"]`` and prints the per-expert token-assignment
   histogram by regime — the direct test of "experts specialize".

Run on the chip: ``python scripts/probe_moe_regimes.py``
(CPU works too: ``JAX_PLATFORMS=cpu`` before interpreter start is not
enough under the axon sitecustomize — use the conftest trick or just let
it run on the chip).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = "/tmp/egt_moe_regimes"
EPOCHS = int(os.environ.get("MOE_AB_EPOCHS", "5"))
SEED = 369


def make_datasets():
    from extended_gan_tpu.data.synthetic import make_kmni_dataset

    paths = {
        "mixed": os.path.join(ROOT, "mixed"),
        "storm": os.path.join(ROOT, "storm"),
        "drizzle": os.path.join(ROOT, "drizzle"),
    }
    if not os.path.isdir(os.path.join(paths["mixed"], "train")):
        # training archive: files alternate storm/drizzle
        make_kmni_dataset(paths["mixed"], n_train_files=8, n_test_files=2,
                          frames_per_file=64, regimes=("storm", "drizzle"),
                          seed=11)
        # pure eval sets (held-out seeds)
        make_kmni_dataset(paths["storm"], n_train_files=2, n_test_files=0,
                          frames_per_file=64, regimes=("storm",), seed=101)
        make_kmni_dataset(paths["drizzle"], n_train_files=2, n_test_files=0,
                          frames_per_file=64, regimes=("drizzle",), seed=202)
    return paths


def train_one(moe_experts: int, data_dir: str,
              aux_weight: float = 0.01) -> dict:
    from extended_gan_tpu.train.gat_driver import train

    out = os.path.join(ROOT, f"run_e{moe_experts}_aux{aux_weight}")
    os.makedirs(out, exist_ok=True)
    hist_path = os.path.join(out, "history.json")
    if os.path.exists(hist_path):
        hist = json.load(open(hist_path))
        if len(hist.get("val_loss", [])) >= EPOCHS:
            print(f"[probe] {out} already trained; reusing", flush=True)
            vl = hist["val_loss"]
            return {"out": out, "val_loss_best": min(vl),
                    "val_loss_final": vl[-1]}
    train(
        model_type="unet", mapping_type="conv", optimizer="adam",
        preprocessed_folder=data_dir, dataset="kmni",
        downsample_size=(20, 20), train_batch_size=32, test_batch_size=64,
        epochs=EPOCHS, learning_rate=1e-3, plot=False, seed=SEED,
        moe_experts=moe_experts, moe_aux_weight=aux_weight,
        output_path=out,
    )
    hist = json.load(open(os.path.join(out, "history.json")))
    vl = hist["val_loss"]  # column-oriented: {metric: [per-epoch...]}
    return {"out": out, "val_loss_best": min(vl), "val_loss_final": vl[-1]}


def _load_trained(moe_experts: int, out: str):
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train.checkpoint import load_model
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    mesh = MeshContext.create()
    model = build_model("unet", image_width=20, image_height=20,
                        n_vertices=6, mapping_type="conv", time_steps=4,
                        moe_experts=moe_experts)
    state = create_net_state(model, adam(1e-3), KeySeq(SEED).next(),
                             jnp.zeros((2, 20, 20, 4, 6)))
    params, bs = load_model(os.path.join(out, "model.msgpack"),
                            state.params, state.batch_stats)
    state = mesh.put_replicated(state.replace(params=params,
                                              batch_stats=bs))
    return mesh, model, state


def eval_per_regime(moe_experts: int, out: str, regime_dirs: dict) -> dict:
    """val_loss per pure-regime set + (MoE only) expert-load histograms."""
    import jax

    from extended_gan_tpu.data.streaming import KmniLoader
    from extended_gan_tpu.train.gat_trainer import (
        _prep_gat_batch,
        make_gat_eval_step,
    )

    mesh, model, state = _load_trained(moe_experts, out)
    eval_step = make_gat_eval_step(model)

    results = {}
    for regime, folder in regime_dirs.items():
        ld = KmniLoader(64, os.path.join(folder, "train"), crop=20,
                        time_steps=4, shuffle=False, use_native=False)
        loss_num = n_valid = 0.0
        load_acc = None
        for x, y in ld:
            xd, yd, mask = _prep_gat_batch(mesh, x, y)
            o = eval_step(state, xd, yd, mask, 0.5, 1.0, power=1.0)
            loss_num += float(o["loss_num"])
            n_valid += float(o["n"])
            if moe_experts:
                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                _, muts = model.apply(variables, xd, train=False,
                                      mutable=["routing"])
                loads = jax.tree_util.tree_leaves(muts["routing"])
                tot = np.sum([np.asarray(l) for l in loads], axis=0)
                load_acc = tot if load_acc is None else load_acc + tot
        entry = {"val_loss": loss_num / n_valid}
        if load_acc is not None:
            frac = load_acc / load_acc.sum()
            entry["expert_load_frac"] = [round(float(f), 4) for f in frac]
        results[regime] = entry
    return results


def main():
    paths = make_datasets()
    regime_dirs = {"storm": paths["storm"], "drizzle": paths["drizzle"]}
    report = {"epochs": EPOCHS, "seed": SEED}
    # third config: the shipped --moe-aux-weight knob turned up 10x, the
    # fair test of whether load balancing (not just capacity) drives
    # routing apart on heterogeneous data
    for e, aux, tag in ((0, 0.01, "dense"), (4, 0.01, "moe4"),
                        (4, 0.1, "moe4_aux0.1")):
        print(f"=== training {tag} ===", flush=True)
        r = train_one(e, paths["mixed"], aux_weight=aux)
        r["per_regime"] = eval_per_regime(e, r["out"], regime_dirs)
        report[tag] = r
        print(json.dumps({tag: r}, indent=2), flush=True)
    d, m = report["dense"], report["moe4"]
    report["val_loss_delta_pct"] = round(
        100 * (m["val_loss_best"] - d["val_loss_best"])
        / d["val_loss_best"], 2)
    with open(os.path.join(ROOT, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
