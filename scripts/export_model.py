"""Export a trained model to a serving artifact (StableHLO via jax.export).

Produces one self-contained file (weights baked in, batch axis symbolic)
that serves any batch size without the model's Python code — the
production-deployment step the reference lacks entirely (its checkpoints
are state_dicts that need the full training repo to load:
/root/reference/convolutional_gat/compare_models/__main__.py:122-125).

Usage:
  # conv-GAT / unet / baseline experiment (config.py + model.msgpack):
  python scripts/export_model.py convolutional_gat/experiments/demo_unet \
      --out /tmp/unet.stablehlo --check

  # trained DCGAN generator (Orbax checkpoint dir written by `-m dcgan`):
  python scripts/export_model.py /path/to/dcgan_out --workload dcgan \
      --out /tmp/g.stablehlo --check
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _export_gat(args):
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.checkpoint import load_model
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state
    from extended_gan_tpu.utils.config import load_experiment_config

    cfg = load_experiment_config(args.experiment_dir)
    w, h = args.width or cfg.downsample_size[0], \
        args.height or cfg.downsample_size[1]
    t, v = args.time_steps, args.vertices
    moe_experts = getattr(cfg, "moe_experts", 0)
    if moe_experts and not args.fixed_batch:
        # MoE routing (models/moe.py) sizes the per-expert capacity from
        # the static token count — a symbolic batch axis has none
        args.fixed_batch = 1
        print("[export] MoE model: batch axis pinned to 1 "
              "(--fixed-batch overrides)")
    model = build_model(
        cfg.model_type, image_width=w, image_height=h, n_vertices=v,
        mapping_type=cfg.mapping_type, time_steps=t,
        moe_experts=moe_experts,
    )
    state = create_net_state(
        model, adam(1e-3), KeySeq(cfg.seed).next(), jnp.zeros((2, w, h, t, v))
    )
    ckpt = os.path.join(args.experiment_dir, "model.msgpack")
    if not os.path.exists(ckpt):
        raise SystemExit(f"no checkpoint at {ckpt}; train the experiment "
                         f"first (generate_experiment)")
    params, bs = load_model(ckpt, state.params, state.batch_stats)
    variables = {"params": params}
    if bs:
        variables["batch_stats"] = bs

    def apply_fn(v, x):
        return model.apply(v, x, train=False)

    def fwd(x):
        return apply_fn(variables, x)

    example = jnp.zeros((1, w, h, t, v), jnp.float32)
    meta = {"source": args.experiment_dir, "model_type": cfg.model_type,
            "mapping_type": cfg.mapping_type}
    return fwd, example, meta, {"apply_fn": apply_fn,
                                "variables": variables}


def _export_dcgan(args):
    import jax.numpy as jnp

    from extended_gan_tpu.train.checkpoint import CheckpointManager
    from extended_gan_tpu.train.dcgan_driver import (
        DEFAULT_PARAMS,
        build_dcgan,
    )

    params = dict(DEFAULT_PARAMS)
    if args.imsize:
        params["imsize"] = args.imsize
    if args.ndf:
        # template widths must MATCH the checkpoint's training widths or
        # the Orbax restore fails on tree-structure mismatch
        params["ngf"] = params["ndf"] = args.ndf
    # seed only shapes the template init; restore() overwrites every weight.
    # packed_g changes only the COMPUTE layout (2x2 space-to-depth convs,
    # ops/space_to_depth.py) — the param tree is identical, so any
    # checkpoint loads into either layout.
    models, _, states, _ = build_dcgan(params, seed=369,
                                       packed_g=args.packed_g)
    mgr = CheckpointManager(os.path.join(args.experiment_dir, "checkpoints"))
    if mgr.latest_step() is None:
        raise SystemExit(f"no Orbax checkpoints under {args.experiment_dir}; "
                         f"train with --save-epoch first")
    import numpy as np

    from extended_gan_tpu.train.checkpoint import gan_restore_template

    restored = mgr.restore(
        gan_restore_template(mgr, states, np.zeros(2, np.uint32))
    )
    g_model, g_state = models[0], restored["states"].g
    variables = {"params": g_state.params}
    if g_state.batch_stats:
        variables["batch_stats"] = g_state.batch_stats

    def fwd(x):
        return g_model.apply(variables, x, train=False)

    im, nc = params["imsize"], params["nc"]
    example = jnp.zeros((1, im, im, nc), jnp.float32)
    meta = {"source": args.experiment_dir, "model_type": "dcgan_generator",
            "epoch": int(restored["epoch"]),
            "layout": "packed2" if args.packed_g else "default"}
    return fwd, example, meta, variables


def _export_cyclegan(args):
    import jax.numpy as jnp
    import numpy as np

    from extended_gan_tpu.train.checkpoint import CheckpointManager
    from extended_gan_tpu.train.cyclegan_driver import build_cyclegan

    imsize = args.imsize or 64
    ndf = args.ndf or 64
    # seed only shapes the template init; restore() overwrites every weight
    models, _, states, _, _, _ = build_cyclegan(
        nc=4, ndf=ndf, imsize=imsize, seed=369, packed_g=args.packed_g)
    mgr = CheckpointManager(os.path.join(args.experiment_dir, "checkpoints"))
    if mgr.latest_step() is None:
        raise SystemExit(f"no Orbax checkpoints under {args.experiment_dir}; "
                         f"train with --save-epoch first")
    from extended_gan_tpu.train.checkpoint import gan_restore_template

    restored = mgr.restore(
        gan_restore_template(mgr, states, np.zeros(2, np.uint32))
    )
    g_model, g_state = (
        (models[0], restored["states"].g_xy) if args.direction == "xy"
        else (models[1], restored["states"].g_yx)
    )
    variables = {"params": g_state.params}
    if g_state.batch_stats:
        variables["batch_stats"] = g_state.batch_stats

    def fwd(x):
        return g_model.apply(variables, x, train=False)

    example = jnp.zeros((1, imsize, imsize, 4), jnp.float32)
    meta = {"source": args.experiment_dir,
            "model_type": f"cyclegan_generator_{args.direction}",
            "epoch": int(restored["epoch"]),
            "layout": "packed2" if args.packed_g else "default"}
    return fwd, example, meta, variables


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_dir")
    parser.add_argument("--workload", choices=("gat", "dcgan", "cyclegan"),
                        default="gat")
    parser.add_argument("--direction", choices=("xy", "yx"), default="xy",
                        help="which CycleGAN generator to export")
    parser.add_argument("--out", type=str, default="")
    parser.add_argument("--width", type=int, default=0)
    parser.add_argument("--height", type=int, default=0)
    parser.add_argument("--time-steps", type=int, default=4)
    parser.add_argument("--vertices", type=int, default=6)
    parser.add_argument("--imsize", type=int, default=0)
    parser.add_argument("--ndf", type=int, default=0,
                        help="discriminator/template width used at "
                             "TRAINING time (must match the checkpoint)")
    parser.add_argument("--packed-g", dest="packed_g", action="store_true",
                        help="export the generator's 2x2 space-to-depth "
                             "compute layout (dcgan/cyclegan only): the "
                             "identical function and checkpoint in "
                             "MXU-fatter packed convs. Measured SLOWER "
                             "than the default at every serving point "
                             "on v5e (BENCH_NOTES 'packed_g ablation') "
                             "— provided for one-flag re-measurement on "
                             "other geometries")
    parser.add_argument("--quantize", choices=("w8", "w8a8"), default="",
                        help="post-training int8 quantization of the "
                             "exported generator (dcgan/cyclegan only): "
                             "w8 = weight-only int8 (smaller artifact, "
                             "f32 compute), w8a8 = int8 convs with int32 "
                             "accumulation (MXU-native integer path; "
                             "activation scales calibrated on a synthetic "
                             "[0,1] frame batch — serve/quantize.py)")
    parser.add_argument("--calib-npz", type=str, default="",
                        help="with --quantize w8a8: .npy/.npz file holding "
                             "a REPRESENTATIVE input batch for activation-"
                             "scale calibration (e.g. saved from the real "
                             "loader); real nowcast frames are spatially "
                             "correlated, so their activation ranges can "
                             "exceed what the default uniform-noise batch "
                             "covers")
    parser.add_argument("--rollout", type=int, default=1,
                        help="K>1: export a K-step autoregressive rollout "
                             "(serve/rollout.py) — the prediction window "
                             "feeds back as the next context inside ONE "
                             "lax.scan program, so the artifact emits the "
                             "full (B, K, ...) horizon in a single "
                             "dispatch; composes with --quantize")
    parser.add_argument("--rollout-final", dest="rollout_final",
                        action="store_true",
                        help="with --rollout K: emit ONLY window K (the "
                             "'forecast K windows ahead' artifact) — "
                             "intermediate windows never leave the "
                             "device, so the reply stays one window and "
                             "remote serving is near-flat in K "
                             "(probe_rollout_serving.py)")
    parser.add_argument("--platforms", type=str, nargs="*", default=None,
                        help="target runtimes, e.g. --platforms tpu cpu "
                             "(default: current backend only)")
    parser.add_argument("--fixed-batch", type=int, default=0,
                        help="pin the batch axis instead of exporting it "
                             "symbolically")
    parser.add_argument("--check", action="store_true",
                        help="reload the artifact and verify numerics vs "
                             "the live model at two batch sizes")
    args = parser.parse_args(argv)
    if args.packed_g and args.workload == "gat":
        raise SystemExit("--packed-g applies to the dcgan/cyclegan "
                         "generator workloads only")
    if args.quantize == "w8a8" and args.workload == "gat":
        raise SystemExit("--quantize w8a8 needs the BN-folded conv chain "
                         "of the dcgan/cyclegan generators; the gat/unet "
                         "families support weight-only --quantize w8")
    if args.quantize and args.packed_g:
        raise SystemExit("--quantize folds BN into the canonical conv "
                         "layout; combine with --packed-g is unsupported")
    if args.rollout < 1:
        raise SystemExit("--rollout must be >= 1")
    if args.rollout_final and args.rollout == 1:
        raise SystemExit("--rollout-final needs --rollout K with K > 1")

    import numpy as np

    from extended_gan_tpu.serve import (
        export_forward,
        save_exported,
        serving_fn,
    )

    fwd, example, meta, qctx = {
        "dcgan": _export_dcgan,
        "cyclegan": _export_cyclegan,
        "gat": _export_gat,
    }[args.workload](args)
    if args.quantize:
        if args.workload == "gat":
            # no foldable conv+BN chain: generic weight-only int8 over
            # the variable tree (kernel/W leaves; serve/quantize.py)
            from extended_gan_tpu.serve.quantize import make_w8_apply

            fwd, qmeta = make_w8_apply(qctx["apply_fn"], qctx["variables"])
        else:
            from extended_gan_tpu.serve import make_quantized_generator

            if args.calib_npz:
                loaded = np.load(args.calib_npz)
                if hasattr(loaded, "files"):  # .npz: first array wins
                    loaded = loaded[loaded.files[0]]
                calib = np.asarray(loaded, np.float32)
                if calib.shape[1:] != example.shape[1:]:
                    raise SystemExit(
                        f"--calib-npz batch shape {calib.shape} does not "
                        f"match the model input (*, {example.shape[1:]})")
                meta["calibration"] = args.calib_npz
            else:
                # fallback: the generator's input domain is normalized
                # frames in [0, 1] (data_loader normalization,
                # BASELINE.md); pass --calib-npz for real-data scales
                calib = np.random.default_rng(0).random(
                    (8, *example.shape[1:]), np.float32)
                meta["calibration"] = "uniform[0,1) synthetic"
            # reference_apply guards the BN fold against generator drift
            fwd, qmeta = make_quantized_generator(
                qctx, mode=args.quantize, calib_x=calib,
                reference_apply=fwd)
        meta.update(qmeta)
    if args.rollout > 1:
        from extended_gan_tpu.serve import make_rollout

        fwd = make_rollout(fwd, args.rollout,
                           final_only=args.rollout_final)
        meta["rollout"] = args.rollout
        meta["rollout_final_only"] = bool(args.rollout_final)
    if args.fixed_batch:
        example = np.zeros((args.fixed_batch, *example.shape[1:]),
                           example.dtype)
    exported = export_forward(
        fwd, example,
        batch_polymorphic=not args.fixed_batch,
        platforms=args.platforms,
    )
    out = args.out or os.path.join(args.experiment_dir, "model.stablehlo")
    info = save_exported(exported, out, metadata=meta)
    print(json.dumps({"out": out, **info}, indent=2))

    if args.check:
        serve = serving_fn(out)
        batches = (args.fixed_batch,) if args.fixed_batch else (2, 5)
        # quantized closures round() to int8 bins: a 1-ulp f32 difference
        # between the artifact's compilation and the live jit can flip a
        # bin, so the agreement budget is one quantization step, not f32
        # noise (tests/test_quantize.py pins quantized-vs-f32 numerics)
        # single-step f32 artifacts must match the live model to 1e-5;
        # artifact-vs-live 1-ulp compile differences compound through a
        # rollout's re-entrant windows (measured ~4e-5 after 8 windows of
        # the trained dcgan generator), as do quantization bin-flips —
        # those budgets scale with the horizon depth
        if args.quantize:
            tol = 5e-3 * args.rollout
        else:
            tol = 1e-5 if args.rollout == 1 else 2e-5 * args.rollout
        for b in batches:
            rng = np.random.default_rng(0)
            x = rng.random((b, *example.shape[1:]), np.float32)
            got = np.asarray(serve(x))
            want = np.asarray(fwd(x))
            err = float(np.max(np.abs(got - want)))
            print(f"check b={b}: max|serve - live| = {err:.3e}")
            assert err < tol, "exported artifact diverges from live model"
        print("check OK")
    return out


if __name__ == "__main__":
    main()
