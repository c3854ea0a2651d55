"""Import a reference PyTorch checkpoint into this framework.

The reference's conv-GAT training loop saves its best model as a torch
``state_dict`` pickle (``t.save(model.state_dict(), .../model.pt)``,
/root/reference/convolutional_gat/train.py:155). This tool converts that
artifact into this framework's ``model.msgpack`` so a migrating user's
TRAINED WEIGHTS carry over — after which every downstream surface
(create_plots, compare_models, predict, export_model/serving) works on
them unchanged.

Supported model families: ``baseline`` (BaselineModel) and ``baseline2d``
(BaselineModel2D) — the reference's two committed-benchmark rows
(BASELINE.md: final_1d_gat, final_2d_baseline). Their torch sources live
entirely in the reference tree and our flax param trees mirror their
``state_dict`` key schema one-for-one (``{hidden,output}_layer.
attention_{i}.{W,a,B}``, same tensor layouts — no transposes), so the
import is an exact key translation. The GAT3D/SmaAt-UNet families are
NOT importable: their torch sources come from the reference's
``GAT3D`` package which is absent from its tree, so the authoritative
``state_dict`` key schema is unknowable here; retrain those (the model
contracts are reproduced exactly — tests/test_gat_models.py pins the
43,936-param GAT3D footprint).

Usage:
  # experiment dir with config.py (reference-style, legacy MODEL= form ok)
  python scripts/import_torch_checkpoint.py <experiment_dir> \
      [--pt model.pt] [--out model.msgpack] [--check]

  # or explicit geometry, no config.py needed:
  python scripts/import_torch_checkpoint.py --model-type baseline \
      --width 20 --height 20 --vertices 6 --pt model.pt --out model.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUPPORTED = ("baseline", "baseline2d")


def _load_state_dict(path: str):
    import torch

    # weights_only: never execute pickle code from a checkpoint. A whole
    # saved module (rather than a state_dict) fails this load — torch's
    # error says so; re-save it as model.state_dict() and retry.
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj \
            and all(hasattr(v, "numpy") for v in obj["state_dict"].values()):
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise SystemExit(f"{path} is not a state_dict pickle")
    return obj


def translate_state_dict(state_dict, template_params):
    """Map dotted torch keys onto the flax param tree.

    Generic and fully validated: every torch key must resolve to an
    existing leaf of identical shape, and every template leaf must be
    covered — a partial or misshapen import is an error, never silent.
    """
    import jax
    import numpy as np

    params = jax.tree_util.tree_map(lambda x: None, template_params)
    for key, tensor in state_dict.items():
        node, tpl = params, template_params
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in tpl:
                raise SystemExit(
                    f"torch key {key!r}: no module {p!r} in the target "
                    f"param tree (have: {sorted(tpl)})")
            node, tpl = node[p], tpl[p]
        leaf = parts[-1]
        if leaf not in tpl:
            raise SystemExit(
                f"torch key {key!r}: no param {leaf!r} in the target "
                f"module (have: {sorted(tpl)})")
        value = np.asarray(tensor.detach().numpy() if hasattr(tensor, "detach")
                           else tensor)
        want = tuple(tpl[leaf].shape)
        if tuple(value.shape) != want:
            raise SystemExit(
                f"torch key {key!r}: shape {tuple(value.shape)} != "
                f"expected {want} — wrong geometry or model family?")
        node[leaf] = value.astype(np.asarray(tpl[leaf]).dtype)

    missing = [
        "/".join(str(k.key) for k in path)
        for path, v in jax.tree_util.tree_flatten_with_path(
            params, is_leaf=lambda x: x is None)[0]
        if v is None
    ]
    if missing:
        raise SystemExit(f"state_dict covers only part of the model; "
                         f"missing params: {missing}")
    return params


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_dir", nargs="?", default="")
    parser.add_argument("--pt", default="",
                        help="torch checkpoint (default: "
                             "<experiment_dir>/model.pt)")
    parser.add_argument("--out", default="",
                        help="output (default: <experiment_dir>/"
                             "model.msgpack)")
    parser.add_argument("--model-type", default="",
                        help=f"override the config's family; importable: "
                             f"{SUPPORTED}")
    parser.add_argument("--width", type=int, default=0)
    parser.add_argument("--height", type=int, default=0)
    parser.add_argument("--vertices", type=int, default=6)
    parser.add_argument("--time-steps", type=int, default=4)
    parser.add_argument("--check", action="store_true",
                        help="reload the written msgpack and run one "
                             "forward pass")
    args = parser.parse_args(argv)

    if args.experiment_dir:
        from extended_gan_tpu.utils.config import load_experiment_config

        cfg = load_experiment_config(args.experiment_dir)
        model_type = args.model_type or cfg.model_type
        w = args.width or cfg.downsample_size[0]
        h = args.height or cfg.downsample_size[1]
    else:
        if not (args.model_type and args.width and args.height and args.pt):
            raise SystemExit("without an experiment dir, pass --model-type "
                             "--width --height --pt")
        model_type, w, h = args.model_type, args.width, args.height
    if model_type not in SUPPORTED:
        raise SystemExit(
            f"model_type {model_type!r} is not importable: the reference "
            f"tree only contains torch sources (and therefore a knowable "
            f"state_dict schema) for {SUPPORTED}; the GAT3D/SmaAt-UNet "
            f"families must be retrained here (their contracts are "
            f"reproduced exactly — see PARITY.md §2.6)")

    pt = args.pt or os.path.join(args.experiment_dir, "model.pt")
    out = args.out or os.path.join(args.experiment_dir, "model.msgpack")
    state_dict = _load_state_dict(pt)

    import jax
    import jax.numpy as jnp

    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.checkpoint import load_model, save_model

    model = build_model(model_type, image_width=w, image_height=h,
                        n_vertices=args.vertices, mapping_type="linear",
                        time_steps=args.time_steps)
    sample = jnp.zeros((2, w, h, args.time_steps, args.vertices),
                       jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample, train=False)
    params = translate_state_dict(state_dict, template["params"])
    save_model(out, params, template.get("batch_stats"))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"imported {len(state_dict)} tensors ({n:,} params) "
          f"from {pt} -> {out}")

    if args.check:
        import numpy as np

        p2, bs2 = load_model(out, template["params"],
                             template.get("batch_stats"))
        variables = {"params": p2}
        if bs2:
            variables["batch_stats"] = bs2
        x = jnp.asarray(np.random.default_rng(0).random(
            (2, w, h, args.time_steps, args.vertices), np.float32))
        y = model.apply(variables, x, train=False)
        assert np.isfinite(np.asarray(y)).all()
        print(f"check OK: forward {x.shape} -> {y.shape}, "
              f"mean {float(jnp.mean(y)):.6f}")
    return out


if __name__ == "__main__":
    main()
