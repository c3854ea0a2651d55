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


def make_vanilla_gan_step(g_model, d_model, g_tx, d_tx, *, latent_dim: int,
                          fused_prop: bool = False):
    """One fused G+D update for the vanilla GAN.

    Returns step(g_state, d_state, real_imgs, rng) ->
    (g_state, d_state, {g_loss, d_loss}).

    ``fused_prop=True`` (FusedProp, arxiv 2004.03335) computes the fake
    batch's G->D chain once and pulls the G cotangent (bce vs 1) and the
    D-fake cotangent (bce vs 0, over 2) back through it in ONE vmapped
    backward. Unlike the dcgan variant this carries NO semantic
    deviation: the reference updates G first (vanilla_gan.py:163-174),
    so both losses already evaluate the SAME pre-update D at the same
    fake batch, and the vanilla D is stateless (no BN/dropout) — the
    fused and default bodies are the same math reassociated
    (tests/test_vanilla_fused_prop.py).
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(g_state: NetState, d_state: NetState, real_imgs, rng):
        b = real_imgs.shape[0]
        rng_z, rng_gdrop = jax.random.split(rng)
        z = jax.random.normal(rng_z, (b, latent_dim), jnp.float32)

        if fused_prop:
            # ---- shared fake chain: one forward, one 2-cotangent bwd --
            def fake_chain(g_params, d_params):
                gen, new_gbs = _apply_train_with_params(
                    g_model, g_params, g_state.batch_stats, z,
                    rngs={"dropout": rng_gdrop},
                )
                p = _apply_train_with_params(
                    d_model, d_params, d_state.batch_stats, gen
                )[0]
                return p, (gen, new_gbs)

            p_fake, pullback, (gen_imgs, new_gbs) = jax.vjp(
                fake_chain, g_state.params, d_state.params, has_aux=True
            )
            g_loss = bce(p_fake, 1.0)
            ct_g = jax.grad(lambda p: bce(p, 1.0))(p_fake)
            ct_d = jax.grad(lambda p: bce(p, 0.0) / 2.0)(p_fake)
            g_cts, d_cts = jax.vmap(pullback)(jnp.stack([ct_g, ct_d]))
            take = lambda tree, i: jax.tree_util.tree_map(
                lambda t: t[i], tree)
            g_grads = take(g_cts, 0)
            d_grads_fake = take(d_cts, 1)
            g_state = g_state.apply_gradients(g_tx, g_grads).replace(
                batch_stats=new_gbs
            )

            def d_real_loss(d_params):
                p_real = _apply_train_with_params(
                    d_model, d_params, d_state.batch_stats, real_imgs
                )[0]
                return bce(p_real, 1.0) / 2.0

            d_real, d_grads_real = jax.value_and_grad(d_real_loss)(
                d_state.params)
            d_loss = d_real + bce(p_fake, 0.0) / 2.0
            d_grads = jax.tree_util.tree_map(
                jnp.add, d_grads_real, d_grads_fake)
            d_state = d_state.apply_gradients(d_tx, d_grads)
            return g_state, d_state, {"g_loss": g_loss, "d_loss": d_loss}

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
