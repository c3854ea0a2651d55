import argparse

from extended_gan_tpu.train.dcgan_driver import train


def main():
    parser = argparse.ArgumentParser(prog="dcgan")
    parser.add_argument("--data-location", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--train-batch-size", type=int, default=32)
    parser.add_argument("--test-batch-size", type=int, default=64)
    parser.add_argument("--precision", choices=("f32", "bf16"), default="f32")
    parser.add_argument("--seed", type=int, default=369)
    parser.add_argument("--max-batches", type=int, default=0,
                        help="truncate each epoch (smoke runs)")
    parser.add_argument("--synthetic", action="store_true",
                        help="force the synthetic dataset")
    parser.add_argument("--out-dir", type=str, default=None)
    parser.add_argument("--save-epoch", type=int, default=None,
                        help="checkpoint every N epochs (reference "
                             "params['save_epoch']=2)")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the latest checkpoint")
    parser.add_argument("--data-axis", type=int, default=None,
                        help="mesh data-parallel axis size")
    parser.add_argument("--model-axis", type=int, default=1,
                        help="mesh tensor-parallel axis size (shards wide "
                             "discriminator conv kernels + Adam moments)")
    parser.add_argument("--tp-min-channels", type=int, default=256)
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-shard params + Adam moments over the "
                             "data axis (XLA derives the all-gather/"
                             "reduce-scatter schedule)")
    parser.add_argument("--fsdp-min-size", type=int, default=4096,
                        help="leaves under this many elements stay "
                             "replicated under --fsdp")
    parser.add_argument("--spatial", action="store_true",
                        help="shard the frame-height axis over the model "
                             "axis (SP; params replicated, XLA inserts "
                             "conv halo exchanges)")
    parser.add_argument("--megastep", type=int, default=0,
                        help="K>1: scan K adversarial steps into ONE XLA "
                             "program (amortizes per-program dispatch "
                             "overhead K-ways; decisive on remote-"
                             "attached chips)")
    parser.add_argument("--resident", action="store_true",
                        help="transfer the decoded training split to "
                             "device memory ONCE and gather windows "
                             "on-device; steady-state epochs move only "
                             "int32 index programs (composes with "
                             "--megastep as the program length K, "
                             "default 8)")
    parser.add_argument("--fused-disc", action="store_true",
                        help="batch each discriminator's real+fake passes "
                             "into one doubled-batch fwd/bwd (fewer serial "
                             "net passes per step; BN batch statistics mix "
                             "real and fake — a documented deviation)")
    parser.add_argument("--fused-prop", action="store_true",
                        help="FusedProp (arxiv 2004.03335): compute the "
                             "fake G->D chain once and pull the D-fake "
                             "and G cotangents back together in one "
                             "batched backward. G trains against the "
                             "PRE-update discriminators (simultaneous "
                             "update — a documented deviation)")
    parser.add_argument("--packed-g", dest="packed_g", default=None,
                        action="store_true",
                        help="compute the generator in 2x2 space-to-depth "
                             "layout (identical function and param tree; "
                             "MXU-shaped convs). Opt-in")
    parser.add_argument("--no-packed-g", dest="packed_g",
                        action="store_false")
    parser.add_argument("--profile", action="store_true",
                        help="record per-epoch step timing into the history")
    parser.add_argument("--profile-trace-dir", type=str, default="",
                        help="capture a jax.profiler trace of the first "
                             "epoch into this directory (implies --profile)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize the multi-host JAX runtime "
                             "(jax.distributed) before building the mesh — "
                             "see docs/MULTIHOST.md")
    args = parser.parse_args()
    if args.multihost:
        from extended_gan_tpu.parallel import initialize_distributed

        # --multihost is explicit intent: failures must raise
        initialize_distributed(require=True)
    train(
        data_location=args.data_location,
        epochs=args.epochs,
        train_batch_size=args.train_batch_size,
        test_batch_size=args.test_batch_size,
        precision=args.precision,
        seed=args.seed,
        max_batches=args.max_batches,
        synthetic=args.synthetic,
        out_dir=args.out_dir,
        params=(
            {"save_epoch": args.save_epoch}
            if args.save_epoch is not None else None
        ),
        resume=args.resume,
        data_axis=args.data_axis,
        model_axis=args.model_axis,
        tp_min_channels=args.tp_min_channels,
        fsdp=args.fsdp,
        fsdp_min_size=args.fsdp_min_size,
        spatial=args.spatial,
        megastep=args.megastep,
        resident=args.resident,
        fused_disc=args.fused_disc,
        fused_prop=args.fused_prop,
        packed_g=args.packed_g,
        profile=args.profile,
        profile_trace_dir=args.profile_trace_dir,
    )


if __name__ == "__main__":
    main()
