"""Vanilla MLP GAN on (local) MNIST or synthetic digits — TPU-native.

Entry-point parity with /root/reference/gan_examples/vanilla_gan.py
(``python gan_examples/vanilla_gan.py``), same hyperparameter flags
(:17-51), but the whole G+D update is one jitted XLA program and the batch
is sharded over the device mesh's data axis.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_epochs", type=int, default=200,
                        help="number of epochs of training")
    parser.add_argument("--batch_size", type=int, default=64,
                        help="size of the batches")
    parser.add_argument("--lr", type=float, default=0.0002,
                        help="adam: learning rate")
    parser.add_argument("--b1", type=float, default=0.5,
                        help="adam: decay of first order momentum of gradient")
    parser.add_argument("--b2", type=float, default=0.999,
                        help="adam: decay of second order momentum of gradient")
    parser.add_argument("--latent_dim", type=int, default=100,
                        help="dimensionality of the latent space")
    parser.add_argument("--img_size", type=int, default=28,
                        help="size of each image dimension")
    parser.add_argument("--channels", type=int, default=1,
                        help="number of image channels")
    parser.add_argument("--sample_interval", type=int, default=400,
                        help="interval between image samples")
    parser.add_argument("--data_root", type=str, default="data/mnist")
    parser.add_argument("--out_dir", type=str, default="images")
    parser.add_argument("--seed", type=int, default=369)
    parser.add_argument("--precision", choices=("f32", "bf16"), default="f32")
    parser.add_argument("--max_batches", type=int, default=0,
                        help="stop after this many batches (0 = full run)")
    parser.add_argument("--fused_prop", action="store_true",
                        help="FusedProp: one shared fake G->D pass, one "
                             "2-cotangent backward (exact here — the "
                             "vanilla order already evaluates both losses "
                             "at the same pre-update D)")
    parser.add_argument("--log_every", type=int, default=1,
                        help="print losses every N batches (each print "
                             "synchronizes with the device; raise this on "
                             "remote-attached TPUs)")
    return parser.parse_args(argv)


def save_image_grid(imgs: np.ndarray, path: str, nrow: int = 5):
    """Save a grid of images normalized per-grid to [0,1] (the reference
    uses torchvision save_image(normalize=True))."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs = np.asarray(imgs)
    lo, hi = imgs.min(), imgs.max()
    imgs = (imgs - lo) / max(hi - lo, 1e-8)
    n = min(len(imgs), nrow * nrow)
    fig, axes = plt.subplots(nrow, nrow, figsize=(nrow, nrow))
    for i, ax in enumerate(np.ravel(axes)):
        ax.axis("off")
        if i < n:
            ax.imshow(imgs[i, 0], cmap="gray", vmin=0, vmax=1,
                      aspect="equal")
    fig.tight_layout(pad=0.1)
    fig.savefig(path)
    plt.close(fig)


def main(argv=None):
    opt = parse_args(argv)
    print(opt)

    import jax
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.data.mnist import load_images, iterate_batches
    from extended_gan_tpu.models import MLPGenerator, MLPDiscriminator
    from extended_gan_tpu.parallel import MeshContext
    from extended_gan_tpu.train import (
        adam,
        create_net_state,
        make_vanilla_gan_step,
        make_sampler,
    )

    os.makedirs(opt.out_dir, exist_ok=True)
    mesh = MeshContext.create()
    print(f"mesh: data={mesh.n_data} model={mesh.n_model} "
          f"({jax.devices()[0].platform})")

    if opt.channels != 1:
        # the image source is single-channel (MNIST-style); the reference
        # advertises --channels too but crashes the same way if changed
        raise SystemExit("--channels must be 1: the digit sources are "
                         "single-channel")
    img_shape = (opt.channels, opt.img_size, opt.img_size)
    dtype = jnp.bfloat16 if opt.precision == "bf16" else jnp.float32
    g_model = MLPGenerator(img_shape=img_shape, latent_dim=opt.latent_dim,
                           dtype=dtype)
    d_model = MLPDiscriminator(img_shape=img_shape, dtype=dtype)
    g_tx = adam(opt.lr, b1=opt.b1, b2=opt.b2)
    d_tx = adam(opt.lr, b1=opt.b1, b2=opt.b2)

    keys = KeySeq(opt.seed)
    g_state = create_net_state(
        g_model, g_tx, keys.next(),
        jnp.zeros((2, opt.latent_dim), jnp.float32), train=False)
    d_state = create_net_state(
        d_model, d_tx, keys.next(),
        jnp.zeros((2, *img_shape), jnp.float32), train=False)
    g_state = mesh.put_replicated(g_state)
    d_state = mesh.put_replicated(d_state)

    step = make_vanilla_gan_step(
        g_model, d_model, g_tx, d_tx, latent_dim=opt.latent_dim,
        fused_prop=opt.fused_prop)
    sample = make_sampler(g_model)
    fixed_z = jax.random.normal(keys.next(), (25, opt.latent_dim))

    x_all = load_images(opt.data_root, img_size=opt.img_size)
    np_rng = np.random.RandomState(opt.seed)
    batches_done = 0
    for epoch in range(opt.n_epochs):
        n_batches = int(np.ceil(len(x_all) / opt.batch_size))
        for i, imgs in enumerate(iterate_batches(x_all, opt.batch_size,
                                                 rng=np_rng)):
            if len(imgs) % mesh.n_data != 0:
                imgs = imgs[: (len(imgs) // mesh.n_data) * mesh.n_data]
                if len(imgs) == 0:
                    continue
            real = mesh.put_batch(imgs)
            g_state, d_state, losses = step(g_state, d_state, real,
                                            keys.next())
            if batches_done % opt.log_every == 0:
                print(
                    "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
                    % (epoch, opt.n_epochs, i, n_batches,
                       float(losses["d_loss"]), float(losses["g_loss"]))
                )
            if batches_done % opt.sample_interval == 0:
                gen = np.asarray(sample(g_state, fixed_z))
                save_image_grid(gen, os.path.join(opt.out_dir,
                                                  f"{batches_done}.png"))
            batches_done += 1
            if opt.max_batches and batches_done >= opt.max_batches:
                print("max_batches reached; stopping")
                return g_state, d_state
    return g_state, d_state


if __name__ == "__main__":
    main()
