import argparse

from extended_gan_tpu.train.cyclegan_driver import train


def main():
    parser = argparse.ArgumentParser(prog="cycle_gan")
    parser.add_argument("--data-location", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--train-batch-size", type=int, default=32)
    parser.add_argument("--test-batch-size", type=int, default=64)
    parser.add_argument("--imsize", type=int, default=64)
    parser.add_argument("--ndf", type=int, default=64)
    parser.add_argument("--cycle-lambda", type=float, default=10.0)
    parser.add_argument("--precision", choices=("f32", "bf16"), default="f32")
    parser.add_argument("--seed", type=int, default=369)
    parser.add_argument("--max-batches", type=int, default=0)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out-dir", type=str, default=None)
    parser.add_argument("--save-epoch", type=int, default=0,
                        help="checkpoint every N epochs")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the latest checkpoint")
    parser.add_argument("--profile", action="store_true",
                        help="record per-epoch step timing into the history")
    parser.add_argument("--profile-trace-dir", type=str, default="",
                        help="capture a jax.profiler trace of the first "
                             "epoch into this directory (implies --profile)")
    parser.add_argument("--data-axis", type=int, default=None,
                        help="mesh data-parallel axis size")
    parser.add_argument("--model-axis", type=int, default=1,
                        help="mesh tensor-parallel axis size (shards wide "
                             "discriminator conv kernels + Adam moments)")
    parser.add_argument("--tp-min-channels", type=int, default=256)
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-shard params + Adam moments over the "
                             "data axis")
    parser.add_argument("--fsdp-min-size", type=int, default=4096,
                        help="leaves under this many elements stay "
                             "replicated under --fsdp")
    parser.add_argument("--spatial", action="store_true",
                        help="shard the frame-height axis over the model "
                             "axis (SP)")
    parser.add_argument("--megastep", type=int, default=0,
                        help="K>1: scan K CycleGAN steps into ONE XLA "
                             "program (amortizes per-program dispatch "
                             "overhead K-ways; decisive on remote-"
                             "attached chips)")
    parser.add_argument("--resident", action="store_true",
                        help="decode the training archive ONCE into device "
                             "memory; epochs gather windows on-device and "
                             "move only int32 index programs (the fix for "
                             "per-batch host->device transfer walls; see "
                             "data/resident.py)")
    parser.add_argument("--packed-g", dest="packed_g", default=None,
                        action="store_true",
                        help="compute the generators in 2x2 space-to-depth "
                             "layout (identical function and param tree). "
                             "Opt-in")
    parser.add_argument("--no-packed-g", dest="packed_g",
                        action="store_false")
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
        imsize=args.imsize,
        ndf=args.ndf,
        cycle_lambda=args.cycle_lambda,
        precision=args.precision,
        seed=args.seed,
        max_batches=args.max_batches,
        synthetic=args.synthetic,
        out_dir=args.out_dir,
        save_epoch=args.save_epoch,
        resume=args.resume,
        resident=args.resident,
        profile=args.profile,
        profile_trace_dir=args.profile_trace_dir,
        data_axis=args.data_axis,
        model_axis=args.model_axis,
        tp_min_channels=args.tp_min_channels,
        fsdp=args.fsdp,
        fsdp_min_size=args.fsdp_min_size,
        spatial=args.spatial,
        packed_g=args.packed_g,
        megastep=args.megastep,
    )


if __name__ == "__main__":
    main()
