"""Fused adversarial train steps.

The reference runs 6+ separate forward/backward passes per GAN batch with
eager optimizer steps in between (dcgan/train.py:96-164,
gan_examples/vanilla_gan.py:147-188). Here each workload's *entire* update —
every forward, every backward, every Adam moment update, for G and all
discriminators — is one jitted XLA program: one dispatch per step, full
operator fusion, and (with a sharded batch) automatic ICI all-reduces for
data parallelism.

Update-order semantics are preserved exactly:

- vanilla GAN (:func:`make_vanilla_gan_step`): G updates first against the
  current D; D then updates against the *pre-update* G's images
  (vanilla_gan.py:163-188),
- DCGAN (see extended_gan_tpu.train.dcgan_step): discriminators update
  first on real + detached-fake, then G updates through the *updated*
  discriminators (dcgan/train.py:109-164).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

from .losses import bce
from .state import NetState


def _apply_train_with_params(model, params, batch_stats, *args, rngs=None, **kwargs):
    """Run a module in train mode, threading mutable batch stats."""
    variables = {"params": params}
    has_bs = bool(batch_stats)
    if has_bs:
        variables["batch_stats"] = batch_stats
    out = model.apply(
        variables,
        *args,
        train=True,
        mutable=["batch_stats"] if has_bs else False,
        rngs=rngs,
        **kwargs,
    )
    if has_bs:
        y, mut = out
        return y, mut["batch_stats"]
    return out, batch_stats


def apply_eval(model, state: NetState, *args, **kwargs):
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model.apply(variables, *args, train=False, **kwargs)


def make_vanilla_gan_step(g_model, d_model, g_tx, d_tx, *, latent_dim: int):
    """One fused G+D update for the vanilla GAN.

    Returns step(g_state, d_state, real_imgs, rng) ->
    (g_state, d_state, {g_loss, d_loss}).
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(g_state: NetState, d_state: NetState, real_imgs, rng):
        b = real_imgs.shape[0]
        rng_z, rng_gdrop = jax.random.split(rng)
        z = jax.random.normal(rng_z, (b, latent_dim), jnp.float32)

        # ---- generator update (against current D), reference :163-174 ----
        def g_loss_fn(g_params):
            gen, new_gbs = _apply_train_with_params(
                g_model, g_params, g_state.batch_stats, z,
                rngs={"dropout": rng_gdrop},
            )
            p = apply_eval(d_model, d_state, gen)
            # D is applied in train mode in torch, but the vanilla D is
            # stateless (no BN/dropout) so eval==train here.
            return bce(p, 1.0), (gen, new_gbs)

        (g_loss, (gen_imgs, new_gbs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state.params)
        g_state = g_state.apply_gradients(g_tx, g_grads).replace(
            batch_stats=new_gbs
        )

        # ---- discriminator update on pre-update G's images :180-188 -----
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            p_real = _apply_train_with_params(
                d_model, d_params, d_state.batch_stats, real_imgs
            )[0]
            p_fake = _apply_train_with_params(
                d_model, d_params, d_state.batch_stats, gen_detached
            )[0]
            return (bce(p_real, 1.0) + bce(p_fake, 0.0)) / 2.0

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(d_tx, d_grads)

        return g_state, d_state, {"g_loss": g_loss, "d_loss": d_loss}

    return step


def make_sampler(g_model):
    @jax.jit
    def sample(g_state: NetState, z):
        return apply_eval(g_model, g_state, z)

    return sample
