"""CLI parity with /root/reference/convolutional_gat/__main__.py:6-19:
actions `train` and `generate_experiment`."""

import argparse

from extended_gan_tpu.train.gat_driver import train

from .generate_experiment import generate_experiment


def main():
    parser = argparse.ArgumentParser(prog="convolutional_gat")
    parser.add_argument("action", choices=("train", "generate_experiment"))
    # None = "not set": generate_experiment must distinguish an
    # explicit flag from the default so configs win by default
    parser.add_argument("--train-batch-size", type=int, default=None)
    parser.add_argument("--test-batch-size", type=int, default=None)
    parser.add_argument("--exp_folder_name", type=str, default="")
    parser.add_argument("--model-type", type=str, default="temporal")
    parser.add_argument("--mapping-type", type=str, default="linear")
    parser.add_argument("--dataset", type=str, default="kmni")
    parser.add_argument("--preprocessed-folder", type=str, default="")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--learning-rate", type=float, default=None)
    parser.add_argument("--downsample-size", type=int, nargs=2,
                        default=(20, 20))
    parser.add_argument("--output-path", type=str, default="")
    parser.add_argument("--precision", choices=("f32", "bf16"),
                        default=None)
    parser.add_argument("--max-batches", type=int, default=0)
    parser.add_argument("--data-axis", type=int, default=None,
                        help="mesh data-parallel axis size (default: all "
                             "devices / model-axis)")
    parser.add_argument("--model-axis", type=int, default=1,
                        help="mesh tensor-parallel axis size")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-shard params + optimizer moments over "
                             "the data axis (config key FSDP)")
    parser.add_argument("--fsdp-min-size", type=int, default=None,
                        help="smallest leaf (elements) --fsdp shards; "
                             "smaller leaves stay replicated (config key "
                             "FSDP_MIN_SIZE, default 4096)")
    parser.add_argument("--spatial", action="store_true",
                        help="stripe the frame-width axis over the model "
                             "axis (SP; params replicated)")
    parser.add_argument("--megastep", type=int, default=0,
                        help="K>1: scan K train steps into ONE XLA "
                             "program (amortizes per-program dispatch "
                             "overhead K-ways; decisive on remote-"
                             "attached chips — config key MEGASTEP)")
    parser.add_argument("--resident", action="store_true",
                        help="transfer the decoded training split to "
                             "device memory ONCE and gather windows "
                             "on-device; steady-state epochs move only "
                             "int32 index programs (config key RESIDENT; "
                             "composes with --megastep as the program "
                             "length K, default 8)")
    parser.add_argument("--moe-experts", type=int, default=0,
                        help="E>0: Switch-MoE bottleneck with E experts "
                             "on the unet model families (config key "
                             "MOE_EXPERTS); with a data axis that divides "
                             "E, expert weights+moments shard over it "
                             "(expert parallelism)")
    parser.add_argument("--pipeline-stages", type=int, default=0,
                        help="S>1: GPipe pipeline parallelism over the "
                             "model axis for the stacked GAT families "
                             "(model-type baseline) — each device holds "
                             "1/S of the params (config key "
                             "PIPELINE_STAGES)")
    parser.add_argument("--pp-microbatches", type=int, default=0,
                        help="microbatches per PP step (0 = 2*S; must "
                             "divide the train batch; config key "
                             "PP_MICROBATCHES)")
    parser.add_argument("--moe-aux-weight", type=float, default=0.01,
                        help="load-balance aux-loss weight for --moe-"
                             "experts (config key MOE_AUX_WEIGHT)")
    parser.add_argument("--profile", action="store_true",
                        help="record per-epoch step timing (steps/sec, "
                             "dispatch latency) into history.json")
    parser.add_argument("--profile-trace-dir", type=str, default="",
                        help="capture a jax.profiler trace of the first "
                             "epoch into this directory (implies --profile)")
    parser.add_argument("--use-pallas", dest="use_pallas", default=None,
                        action="store_true",
                        help="force the fused Pallas kernels (GAT "
                             "attention, SmaAt-UNet DSC) on. Default: "
                             "auto — ON on TPU, OFF elsewhere (config "
                             "key USE_PALLAS)")
    parser.add_argument("--conv-impl", dest="conv_impl", default="auto",
                        choices=("auto", "nhwc", "chanfirst"),
                        help="conv-mapping layout: nhwc = nn.Conv; "
                             "chanfirst = positions-on-lanes XLA "
                             "reformulation (BENCH_NOTES round 5); auto "
                             "currently = nhwc")
    parser.add_argument("--no-use-pallas", dest="use_pallas",
                        action="store_false",
                        help="force the unfused XLA path (A/B runs, "
                             "Pallas-kernel triage)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize the multi-host JAX runtime "
                             "(jax.distributed) before building the mesh — "
                             "see docs/MULTIHOST.md")
    args = parser.parse_args()
    if args.multihost:
        from extended_gan_tpu.parallel import initialize_distributed

        # --multihost is explicit intent: failures must raise
        initialize_distributed(require=True)
    if args.action == "train":
        train(
            model_type=args.model_type,
            mapping_type=args.mapping_type,
            optimizer="adam",
            output_path=args.output_path,
            train_batch_size=args.train_batch_size or 32,
            test_batch_size=args.test_batch_size or 64,
            epochs=args.epochs or 10,
            learning_rate=args.learning_rate or 1e-3,
            lr_step=1,
            spatial=args.spatial,
            gamma=0.95,
            dataset=args.dataset,
            preprocessed_folder=args.preprocessed_folder,
            downsample_size=tuple(args.downsample_size),
            precision=args.precision or "f32",
            max_batches=args.max_batches,
            data_axis=args.data_axis,
            model_axis=args.model_axis,
            fsdp=args.fsdp,
            fsdp_min_size=args.fsdp_min_size or 4096,
            megastep=args.megastep,
            resident=args.resident,
            use_pallas=args.use_pallas,
            conv_impl=args.conv_impl,
            moe_experts=args.moe_experts,
            moe_aux_weight=args.moe_aux_weight,
            pipeline_stages=args.pipeline_stages,
            pp_microbatches=args.pp_microbatches,
            profile=args.profile,
            profile_trace_dir=args.profile_trace_dir,
        )
    elif args.action == "generate_experiment":
        # every explicitly-set flag becomes a config override; unset flags
        # leave the experiment config in charge
        overrides = dict(
            train_batch_size=args.train_batch_size,
            test_batch_size=args.test_batch_size,
            epochs=args.epochs,
            learning_rate=args.learning_rate,
            precision=args.precision,
            max_batches=args.max_batches or None,
            data_axis=args.data_axis,
            profile=args.profile or None,
            profile_trace_dir=args.profile_trace_dir or None,
            spatial=args.spatial or None,
            fsdp=args.fsdp or None,
            fsdp_min_size=args.fsdp_min_size,
            megastep=args.megastep or None,
            resident=args.resident or None,
            use_pallas=args.use_pallas,
            conv_impl=args.conv_impl,
            moe_experts=args.moe_experts or None,
            pipeline_stages=args.pipeline_stages or None,
            pp_microbatches=args.pp_microbatches or None,
        )
        if args.model_axis != 1:
            overrides["model_axis"] = args.model_axis
        generate_experiment(
            args.exp_folder_name,
            **{k: v for k, v in overrides.items() if v is not None},
        )


if __name__ == "__main__":
    main()
