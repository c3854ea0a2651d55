"""Fused DCGAN adversarial trainer.

Re-implements the training semantics of /root/reference/dcgan/train.py as a
SINGLE jitted XLA program per batch (the reference runs ~8 separate
forward/backward graphs with eager Adam steps interleaved,
dcgan/train.py:96-164). Exact update-order parity:

1. FD/TD gradients on real:   FD(y), TD(concat(x,y)) vs label 1   (:109-117)
2. fake = G(x)                                                      (:122)
3. FD/TD gradients on stop_gradient(fake) vs label 0              (:129-139)
4. FD/TD Adam step on the summed real+fake gradients              (:146-147)
5. G gradients through the *updated* discriminators vs label 1    (:150-160)
   — reusing the same dropout mask as step 2 (torch reuses the tensor)
6. G Adam step                                                     (:164)

BatchNorm running stats thread through calls in the reference's exact
order (real -> detached fake -> fake-for-G). Batches are fixed-shape with a
validity mask (ragged last batches are padded; losses/metrics are
mask-exact; BN batch statistics of a padded final batch see the pad — the
only deliberate deviation, noted here).

Data layout: loaders yield (B, T, 1, H, W); the trainer squeezes and
transposes once to NHWC (B, H, W, T) — frames-as-channels.
"""

from __future__ import annotations

import json
from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import (
    IncrementalTuple,
    MetricsManager,
    masked_batch_metrics,
)
from .adversarial import _apply_train_with_params
from .losses import bce
from .state import NetState


@flax.struct.dataclass
class GANStates:
    g: NetState
    fd: NetState
    td: NetState


def to_nhwc(a: np.ndarray) -> np.ndarray:
    """(B, T, 1, H, W) or (B, T, H, W) -> (B, H, W, T)."""
    if a.ndim == 5:
        a = a.squeeze(2)  # reference squeezes the channel dim (:97-98)
    return np.ascontiguousarray(np.moveaxis(a, 1, -1))


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def make_dcgan_train_step(
    g_model, fd_model, td_model, g_tx, fd_tx, td_tx, *, fused_disc=False,
    dedup_g=False, fused_prop=False,
):
    body = _make_dcgan_step_body(
        g_model, fd_model, td_model, g_tx, fd_tx, td_tx,
        fused_disc=fused_disc, dedup_g=dedup_g, fused_prop=fused_prop,
    )
    return jax.jit(body, donate_argnums=(0,))


def make_dcgan_megastep(
    g_model, fd_model, td_model, g_tx, fd_tx, td_tx, *, fused_disc=False,
    dedup_g=False, fused_prop=False,
):
    """K train steps fused into ONE XLA program via lax.scan.

    The per-PROGRAM dispatch/transport overhead is paid once per K steps
    instead of once per step — decisive on remote-attached chips where
    that overhead is milliseconds (BENCH_NOTES round 3 "time-to-data"
    correction: under honest drain timing the megastep is the FASTEST
    shipped configuration on this rig; the earlier "~3.3x slower than
    chained single steps" verdict was an artifact of the broken
    block_until_ready clock). On a locally-attached chip
    (~10-100 us/program) it is near-neutral: a fully unrolled K-step
    program measures the same per-step device time as the scan
    (scripts/probe_unrolled_chain.py), ~2.7 ms at b32 f32.

    Numerics match K sequential single steps fed the same rng sequence up
    to f32 reduction-order (tests/test_megastep.py proves sequencing under
    SGD at 2e-6 and bounds the Adam near-zero-gradient sensitivity).

    Signature: megastep(states, xs, ys, masks, rngs) with a leading K axis
    on every batch input. Returned logs: ``*_nd`` accumulator pairs are
    summed over the K steps (exact — they are pure (num, denom) sums);
    scalar losses are the LAST step's, matching what a periodic console
    print would have shown.
    """
    from .megastep import wrap_megastep

    body = _make_dcgan_step_body(
        g_model, fd_model, td_model, g_tx, fd_tx, td_tx,
        fused_disc=fused_disc, dedup_g=dedup_g, fused_prop=fused_prop,
    )
    return wrap_megastep(body)


def _make_dcgan_step_body(
    g_model, fd_model, td_model, g_tx, fd_tx, td_tx, *, fused_disc=False,
    dedup_g=False, fused_prop=False,
):
    """``fused_disc=True`` batches each discriminator's real and fake
    passes into ONE doubled-batch forward/backward (real rows first, fake
    rows second). The step is latency-bound by its chain of serial net
    passes (BENCH_NOTES round-3 K-fit: ~2.7 ms device time at b32 f32),
    and a 2B pass costs about the same as a B pass at these shapes, so
    dropping two fwd+bwd chains buys wall-clock directly. Deliberate
    semantic deviations from the reference's sequential passes
    (dcgan/train.py:109-139), both confined to in-discriminator noise:

    - BatchNorm batch statistics inside FD/TD are computed over the mixed
      real+fake 2B batch (the reference normalizes each pass over its own
      B rows), and running stats take one mixed update instead of two;
    - TD's channel-dropout draws one mask over the 2B rows (the reference
      draws independent masks per pass).

    Losses, gradients, the update order (D first on real+fake, then G
    through the updated Ds), and the G-side math are unchanged — with
    BatchNorm/dropout disabled the fused and sequential bodies are
    bit-identical (tests/test_fused_disc.py).

    ``dedup_g=True`` runs the generator forward ONCE per step: the fake
    batch is produced under ``jax.vjp`` and G's gradients arrive by
    pulling the discriminator-side cotangent back through that captured
    forward, instead of re-tracing G inside step 5's ``value_and_grad``.
    This mirrors the reference's actual execution — torch computes
    ``fake = netG(x)`` once (dcgan/train.py:122) and reuses its autograd
    graph for ``errG.backward()`` (:150-160) — whereas the default body
    recomputes a (numerically identical: same params, stats, dropout
    key) forward that XLA may or may not CSE. Same math, same chain
    rule; no semantic deviation (tests/test_dedup_g.py asserts equality
    with the default body WITH BatchNorm and dropout active).

    ``fused_prop=True`` implements FusedProp (arxiv 2004.03335): the fake
    batch's D pass is computed ONCE, and ONE vmapped vjp pullback carries
    BOTH cotangents — the D-fake loss's (bce vs 0, for D gradients) and
    the G loss's (bce vs 1, for G gradients) — back through the shared
    G->D chain, instead of one fwd+bwd for D-fake plus a second fwd+bwd
    for the G chain. Per discriminator this removes one forward and
    merges two backwards into a single 2-cotangent pass. Deliberate
    semantic deviations from the reference order (dcgan/train.py:146-164):

    - G trains against the PRE-update discriminators (simultaneous
      gradient descent) instead of the just-stepped ones;
    - TD's channel dropout draws one mask for the shared fake pass (the
      reference draws a fresh mask for its separate step-5 pass);
    - FD/TD running BN stats take two updates per step (real, fake)
      instead of three (no separate step-5 pass exists).

    The fusion itself is lossless: tests/test_fused_prop.py proves the
    grads equal a naive two-backward implementation of the same
    simultaneous semantics. Mutually exclusive with ``dedup_g`` (which
    restructures the same passes a different way); COMPOSES with
    ``fused_disc`` into the minimal chain — ONE doubled-batch (real+fake)
    forward and ONE 2-cotangent doubled-batch backward per discriminator
    (deviations are the union of both modes': mixed-2B BN statistics, one
    dropout mask, pre-update-D G gradients).
    """
    if fused_prop and dedup_g:
        raise ValueError("fused_prop is mutually exclusive with dedup_g")

    def step(states: GANStates, x, y, mask, rng):
        if fused_prop:
            return _fused_prop_step(
                states, x, y, mask, rng,
                g_model=g_model, fd_model=fd_model, td_model=td_model,
                g_tx=g_tx, fd_tx=fd_tx, td_tx=td_tx,
                fused_disc=fused_disc,
            )
        k_g, k_td1, k_td2, k_td3 = jax.random.split(rng, 4)
        xy_real = jnp.concatenate([x, y], axis=-1)

        # ---- 2) generate fake (hoisted: independent of the D-real pass;
        # under dedup_g the vjp captures THE generator forward of the step)
        def g_fwd(g_params):
            return _apply_train_with_params(
                g_model, g_params, states.g.batch_stats, x,
                rngs={"dropout": k_g},
            )

        g_pullback = None
        if dedup_g:
            fake, g_pullback, g_bs1 = jax.vjp(
                g_fwd, states.g.params, has_aux=True)
        else:
            fake, g_bs1 = g_fwd(states.g.params)
        fake_sg = jax.lax.stop_gradient(fake)

        if not fused_disc:
            # ---- 1) discriminator gradients on real ---------------------
            def d_real_loss(fd_params, td_params):
                p_rf, fd_bs = _apply_train_with_params(
                    fd_model, fd_params, states.fd.batch_stats, y
                )
                p_rt, td_bs = _apply_train_with_params(
                    td_model, td_params, states.td.batch_stats, xy_real,
                    rngs={"dropout": k_td1},
                )
                err_fd = bce(p_rf.reshape(-1), 1.0, mask=mask)
                err_td = bce(p_rt.reshape(-1), 1.0, mask=mask)
                return err_fd + err_td, (p_rf, p_rt, err_fd, err_td, fd_bs, td_bs)

            (_, (p_rf, p_rt, err_fd_real, err_td_real, fd_bs1, td_bs1)), d_grads_real = (
                jax.value_and_grad(d_real_loss, argnums=(0, 1), has_aux=True)(
                    states.fd.params, states.td.params
                )
            )

            xy_fake_sg = jnp.concatenate([x, fake_sg], axis=-1)

            # ---- 3) discriminator gradients on detached fake ------------
            def d_fake_loss(fd_params, td_params):
                p_ff, fd_bs = _apply_train_with_params(
                    fd_model, fd_params, fd_bs1, fake_sg
                )
                p_ft, td_bs = _apply_train_with_params(
                    td_model, td_params, td_bs1, xy_fake_sg,
                    rngs={"dropout": k_td2},
                )
                err_fd = bce(p_ff.reshape(-1), 0.0, mask=mask)
                err_td = bce(p_ft.reshape(-1), 0.0, mask=mask)
                return err_fd + err_td, (p_ff, p_ft, err_fd, err_td, fd_bs, td_bs)

            (_, (p_ff, p_ft, err_fd_fake, err_td_fake, fd_bs2, td_bs2)), d_grads_fake = (
                jax.value_and_grad(d_fake_loss, argnums=(0, 1), has_aux=True)(
                    states.fd.params, states.td.params
                )
            )
            fd_grads = _tree_add(d_grads_real[0], d_grads_fake[0])
            td_grads = _tree_add(d_grads_real[1], d_grads_fake[1])
        else:
            # ---- 1+3 fused) ONE doubled-batch D pass on real+fake rows
            y_all = jnp.concatenate([y, fake_sg], axis=0)
            xy_all = jnp.concatenate(
                [xy_real, jnp.concatenate([x, fake_sg], axis=-1)], axis=0
            )

            def d_loss(fd_params, td_params):
                p_f_all, fd_bs = _apply_train_with_params(
                    fd_model, fd_params, states.fd.batch_stats, y_all
                )
                p_t_all, td_bs = _apply_train_with_params(
                    td_model, td_params, states.td.batch_stats, xy_all,
                    rngs={"dropout": k_td1},
                )
                b = y.shape[0]
                p_rf, p_ff = p_f_all.reshape(-1)[:b], p_f_all.reshape(-1)[b:]
                p_rt, p_ft = p_t_all.reshape(-1)[:b], p_t_all.reshape(-1)[b:]
                err_fd_real = bce(p_rf, 1.0, mask=mask)
                err_td_real = bce(p_rt, 1.0, mask=mask)
                err_fd_fake = bce(p_ff, 0.0, mask=mask)
                err_td_fake = bce(p_ft, 0.0, mask=mask)
                # per-half means, summed == the sequential path's
                # accumulated real+fake gradients
                total = err_fd_real + err_td_real + err_fd_fake + err_td_fake
                return total, (
                    p_rf, p_rt, p_ff, p_ft,
                    err_fd_real, err_td_real, err_fd_fake, err_td_fake,
                    fd_bs, td_bs,
                )

            (_, (p_rf, p_rt, p_ff, p_ft,
                 err_fd_real, err_td_real, err_fd_fake, err_td_fake,
                 fd_bs2, td_bs2)), (fd_grads, td_grads) = (
                jax.value_and_grad(d_loss, argnums=(0, 1), has_aux=True)(
                    states.fd.params, states.td.params
                )
            )

        # ---- 4) discriminator Adam step on accumulated gradients --------
        fd_state = states.fd.apply_gradients(fd_tx, fd_grads)
        td_state = states.td.apply_gradients(td_tx, td_grads)

        # ---- 5) generator gradients through the UPDATED discriminators --
        if dedup_g:
            # cotangent of the D-side loss w.r.t. the (single) fake batch,
            # pulled back through the captured G forward
            def g_out_loss(fake2):
                p_f, fd_bs3 = _apply_train_with_params(
                    fd_model, fd_state.params, fd_bs2, fake2
                )
                p_t, td_bs3 = _apply_train_with_params(
                    td_model, td_state.params, td_bs2,
                    jnp.concatenate([x, fake2], axis=-1),
                    rngs={"dropout": k_td3},
                )
                err = bce(p_f.reshape(-1), 1.0, mask=mask) + bce(
                    p_t.reshape(-1), 1.0, mask=mask
                )
                return err, (fd_bs3, td_bs3)

            (err_g, (fd_bs3, td_bs3)), fake_grad = jax.value_and_grad(
                g_out_loss, has_aux=True
            )(fake)
            (g_grads,) = g_pullback(fake_grad)
            g_bs_final = g_bs1  # recompute would be bit-identical
        else:
            def g_loss_fn(g_params):
                fake2, g_bs = _apply_train_with_params(
                    g_model, g_params, states.g.batch_stats, x,
                    rngs={"dropout": k_g},  # same mask as step 2 (torch reuse)
                )
                p_f, fd_bs3 = _apply_train_with_params(
                    fd_model, fd_state.params, fd_bs2, fake2
                )
                p_t, td_bs3 = _apply_train_with_params(
                    td_model, td_state.params, td_bs2,
                    jnp.concatenate([x, fake2], axis=-1),
                    rngs={"dropout": k_td3},
                )
                err = bce(p_f.reshape(-1), 1.0, mask=mask) + bce(
                    p_t.reshape(-1), 1.0, mask=mask
                )
                return err, (g_bs, fd_bs3, td_bs3)

            (err_g, (g_bs_final, fd_bs3, td_bs3)), g_grads = (
                jax.value_and_grad(g_loss_fn, has_aux=True)(states.g.params)
            )
        g_state = states.g.apply_gradients(g_tx, g_grads).replace(
            batch_stats=g_bs_final
        )
        fd_state = fd_state.replace(batch_stats=fd_bs3)
        td_state = td_state.replace(batch_stats=td_bs3)

        # ---- metrics (mask-exact) ----------------------------------------
        mse_num = jnp.sum(
            ((fake - y) ** 2)
            * mask.reshape((-1,) + (1,) * (y.ndim - 1))
        )
        mse_den = jnp.sum(mask) * jnp.float32(y[0].size)

        logs = {
            "errFD": err_fd_real + err_fd_fake,
            "errTD": err_td_real + err_td_fake,
            "errG": err_g,
            "train_mse_nd": jnp.stack([mse_num, mse_den]),
            "fd_acc_nd": _masked_rounded_match(p_rf, 1.0, mask)
            + _masked_rounded_match(p_ff, 0.0, mask),
            "td_acc_nd": _masked_rounded_match(p_rt, 1.0, mask)
            + _masked_rounded_match(p_ft, 0.0, mask),
        }
        return GANStates(g=g_state, fd=fd_state, td=td_state), logs

    return step


def _masked_rounded_match(p, label, mask):
    m = mask.astype(jnp.float32)
    matches = (jnp.round(p.reshape(-1)) == label).astype(jnp.float32)
    return jnp.stack([jnp.sum(matches * m), jnp.sum(m)])


def _fused_prop_step(states: GANStates, x, y, mask, rng, *,
                     g_model, fd_model, td_model, g_tx, fd_tx, td_tx,
                     fused_disc=False):
    """FusedProp step body (see _make_dcgan_step_body docstring): the
    fake batch's G->D chain is computed once; ONE vmapped vjp pullback
    carries the D-fake cotangent (bce vs 0) and the G cotangent (bce vs
    1) back through it together. With ``fused_disc=True`` the real rows
    join that same chain (doubled-batch D passes), reaching the minimal
    chain: one 2B forward + one 2-cotangent 2B backward per D."""
    if fused_disc:
        return _fused_prop_disc_step(
            states, x, y, mask, rng,
            g_model=g_model, fd_model=fd_model, td_model=td_model,
            g_tx=g_tx, fd_tx=fd_tx, td_tx=td_tx,
        )
    k_g, k_td1, k_td2 = jax.random.split(rng, 3)
    xy_real = jnp.concatenate([x, y], axis=-1)

    # ---- D gradients on real (identical to the default body) ----------
    def d_real_loss(fd_params, td_params):
        p_rf, fd_bs = _apply_train_with_params(
            fd_model, fd_params, states.fd.batch_stats, y
        )
        p_rt, td_bs = _apply_train_with_params(
            td_model, td_params, states.td.batch_stats, xy_real,
            rngs={"dropout": k_td1},
        )
        err_fd = bce(p_rf.reshape(-1), 1.0, mask=mask)
        err_td = bce(p_rt.reshape(-1), 1.0, mask=mask)
        return err_fd + err_td, (p_rf, p_rt, err_fd, err_td, fd_bs, td_bs)

    (_, (p_rf, p_rt, err_fd_real, err_td_real, fd_bs1, td_bs1)), \
        d_grads_real = jax.value_and_grad(
            d_real_loss, argnums=(0, 1), has_aux=True)(
            states.fd.params, states.td.params)

    # ---- shared fake chain: ONE forward, ONE 2-cotangent backward -----
    def fake_chain(g_params, fd_params, td_params):
        fake, g_bs = _apply_train_with_params(
            g_model, g_params, states.g.batch_stats, x,
            rngs={"dropout": k_g},
        )
        p_f, fd_bs = _apply_train_with_params(
            fd_model, fd_params, fd_bs1, fake
        )
        p_t, td_bs = _apply_train_with_params(
            td_model, td_params, td_bs1,
            jnp.concatenate([x, fake], axis=-1),
            rngs={"dropout": k_td2},
        )
        return (p_f.reshape(-1), p_t.reshape(-1)), (fake, g_bs, fd_bs, td_bs)

    (p_ff, p_ft), pullback, (fake, g_bs1, fd_bs2, td_bs2) = jax.vjp(
        fake_chain, states.g.params, states.fd.params, states.td.params,
        has_aux=True,
    )

    err_fd_fake = bce(p_ff, 0.0, mask=mask)
    err_td_fake = bce(p_ft, 0.0, mask=mask)
    err_g = bce(p_ff, 1.0, mask=mask) + bce(p_ft, 1.0, mask=mask)

    def _ct(label):
        return jax.grad(
            lambda pf, pt: bce(pf, label, mask=mask)
            + bce(pt, label, mask=mask),
            argnums=(0, 1),
        )(p_ff, p_ft)

    ct_d, ct_g = _ct(0.0), _ct(1.0)
    stacked_cts = (jnp.stack([ct_d[0], ct_g[0]]),
                   jnp.stack([ct_d[1], ct_g[1]]))
    # vmap of a linear pullback == one batched backward through G->D:
    # row 0 carries the D-fake cotangent, row 1 the G cotangent
    g_cts, fd_cts, td_cts = jax.vmap(pullback)(stacked_cts)
    take = lambda tree, i: jax.tree_util.tree_map(lambda t: t[i], tree)
    fd_grads = _tree_add(d_grads_real[0], take(fd_cts, 0))
    td_grads = _tree_add(d_grads_real[1], take(td_cts, 0))
    g_grads = take(g_cts, 1)

    fd_state = states.fd.apply_gradients(fd_tx, fd_grads).replace(
        batch_stats=fd_bs2)
    td_state = states.td.apply_gradients(td_tx, td_grads).replace(
        batch_stats=td_bs2)
    g_state = states.g.apply_gradients(g_tx, g_grads).replace(
        batch_stats=g_bs1)

    mse_num = jnp.sum(
        ((fake - y) ** 2) * mask.reshape((-1,) + (1,) * (y.ndim - 1))
    )
    mse_den = jnp.sum(mask) * jnp.float32(y[0].size)
    logs = {
        "errFD": err_fd_real + err_fd_fake,
        "errTD": err_td_real + err_td_fake,
        "errG": err_g,
        "train_mse_nd": jnp.stack([mse_num, mse_den]),
        "fd_acc_nd": _masked_rounded_match(p_rf, 1.0, mask)
        + _masked_rounded_match(p_ff, 0.0, mask),
        "td_acc_nd": _masked_rounded_match(p_rt, 1.0, mask)
        + _masked_rounded_match(p_ft, 0.0, mask),
    }
    return GANStates(g=g_state, fd=fd_state, td=td_state), logs


def _fused_prop_disc_step(states: GANStates, x, y, mask, rng, *,
                          g_model, fd_model, td_model, g_tx, fd_tx, td_tx):
    """fused_prop x fused_disc: the minimal dcgan chain. Real and fake
    rows share ONE doubled-batch pass per discriminator, and ONE vmapped
    2-cotangent backward yields the full D gradients (real-vs-1 +
    fake-vs-0 rows) and the G gradients (fake rows vs 1) together.
    Deviations = the union of both modes' (mixed-2B BN statistics, one
    TD dropout mask, pre-update-D G gradients)."""
    k_g, k_td1 = jax.random.split(rng, 2)
    b = y.shape[0]

    def chain(g_params, fd_params, td_params):
        fake, g_bs = _apply_train_with_params(
            g_model, g_params, states.g.batch_stats, x,
            rngs={"dropout": k_g},
        )
        y_all = jnp.concatenate([y, fake], axis=0)
        xy_all = jnp.concatenate(
            [jnp.concatenate([x, y], axis=-1),
             jnp.concatenate([x, fake], axis=-1)], axis=0
        )
        p_f_all, fd_bs = _apply_train_with_params(
            fd_model, fd_params, states.fd.batch_stats, y_all
        )
        p_t_all, td_bs = _apply_train_with_params(
            td_model, td_params, states.td.batch_stats, xy_all,
            rngs={"dropout": k_td1},
        )
        return ((p_f_all.reshape(-1), p_t_all.reshape(-1)),
                (fake, g_bs, fd_bs, td_bs))

    (p_f_all, p_t_all), pullback, (fake, g_bs1, fd_bs2, td_bs2) = jax.vjp(
        chain, states.g.params, states.fd.params, states.td.params,
        has_aux=True,
    )
    p_rf, p_ff = p_f_all[:b], p_f_all[b:]
    p_rt, p_ft = p_t_all[:b], p_t_all[b:]

    err_fd_real = bce(p_rf, 1.0, mask=mask)
    err_td_real = bce(p_rt, 1.0, mask=mask)
    err_fd_fake = bce(p_ff, 0.0, mask=mask)
    err_td_fake = bce(p_ft, 0.0, mask=mask)
    err_g = bce(p_ff, 1.0, mask=mask) + bce(p_ft, 1.0, mask=mask)

    def _d_losses(pf_all, pt_all):
        return (bce(pf_all[:b], 1.0, mask=mask)
                + bce(pf_all[b:], 0.0, mask=mask)
                + bce(pt_all[:b], 1.0, mask=mask)
                + bce(pt_all[b:], 0.0, mask=mask))

    def _g_losses(pf_all, pt_all):
        return (bce(pf_all[b:], 1.0, mask=mask)
                + bce(pt_all[b:], 1.0, mask=mask))

    ct_d = jax.grad(_d_losses, argnums=(0, 1))(p_f_all, p_t_all)
    ct_g = jax.grad(_g_losses, argnums=(0, 1))(p_f_all, p_t_all)
    stacked_cts = (jnp.stack([ct_d[0], ct_g[0]]),
                   jnp.stack([ct_d[1], ct_g[1]]))
    g_cts, fd_cts, td_cts = jax.vmap(pullback)(stacked_cts)
    take = lambda tree, i: jax.tree_util.tree_map(lambda t: t[i], tree)
    fd_grads = take(fd_cts, 0)
    td_grads = take(td_cts, 0)
    g_grads = take(g_cts, 1)

    fd_state = states.fd.apply_gradients(fd_tx, fd_grads).replace(
        batch_stats=fd_bs2)
    td_state = states.td.apply_gradients(td_tx, td_grads).replace(
        batch_stats=td_bs2)
    g_state = states.g.apply_gradients(g_tx, g_grads).replace(
        batch_stats=g_bs1)

    mse_num = jnp.sum(
        ((fake - y) ** 2) * mask.reshape((-1,) + (1,) * (y.ndim - 1))
    )
    mse_den = jnp.sum(mask) * jnp.float32(y[0].size)
    logs = {
        "errFD": err_fd_real + err_fd_fake,
        "errTD": err_td_real + err_td_fake,
        "errG": err_g,
        "train_mse_nd": jnp.stack([mse_num, mse_den]),
        "fd_acc_nd": _masked_rounded_match(p_rf, 1.0, mask)
        + _masked_rounded_match(p_ff, 0.0, mask),
        "td_acc_nd": _masked_rounded_match(p_rt, 1.0, mask)
        + _masked_rounded_match(p_ft, 0.0, mask),
    }
    return GANStates(g=g_state, fd=fd_state, td=td_state), logs


def make_dcgan_eval_step(g_model, fd_model, td_model):
    """Eval pass parity with dcgan/train.py:26-77 (BN running stats,
    dropout off). Returns per-batch (num, denom) metric pairs + fake."""

    def _apply(model, state, *args):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, *args, train=False)

    @jax.jit
    def eval_step(states: GANStates, x, y, mask):
        fake = _apply(g_model, states.g, x)
        xy_real = jnp.concatenate([x, y], axis=-1)
        xy_fake = jnp.concatenate([x, fake], axis=-1)
        p_rf = _apply(fd_model, states.fd, y).reshape(-1)
        p_rt = _apply(td_model, states.td, xy_real).reshape(-1)
        p_ff = _apply(fd_model, states.fd, fake).reshape(-1)
        p_ft = _apply(td_model, states.td, xy_fake).reshape(-1)

        ones = jnp.ones_like(p_rf)
        zeros = jnp.zeros_like(p_rf)
        # MetricsManager("accuracy") semantics: binarize at 0.5 with `<`
        # polarity, denominator = y[0].numel() = 1 per update.
        def acc_nd(p, label):
            return jnp.stack(
                [
                    jnp.sum(
                        ((p < 0.5) == (label < 0.5)).astype(jnp.float32)
                        * mask
                    ),
                    jnp.float32(1.0),
                ]
            )

        pred_nd = masked_batch_metrics(
            ("accuracy", "precision", "recall", "mse"), y, fake, mask
        )
        logs = {
            "fd_acc_nd": acc_nd(p_rf, ones) + acc_nd(p_ff, zeros),
            "td_acc_nd": acc_nd(p_rt, ones) + acc_nd(p_ft, zeros),
            "pred_nd": pred_nd,
        }
        return fake, logs

    return eval_step


# --------------------------------------------------------------------------
# Host-side epoch drivers (reference API parity).
# --------------------------------------------------------------------------
def _feed(loader, mesh, batch_size, spatial=False):
    """Yield fixed-shape sharded (x, y, mask) device batches.

    ``spatial=True`` additionally shards the frame-height axis over the
    mesh's ``model`` axis (SP — see MeshContext.put_batch_spatial)."""
    from ..data.streaming import Prefetcher

    padded = mesh.padded_batch_size(batch_size)
    put = mesh.put_batch_spatial if spatial else mesh.put_batch

    def prepare(item):
        x, y = item
        x, y = to_nhwc(x), to_nhwc(y)
        x, y, mask = mesh.pad_to_batch_multiple(x, y, batch_size=padded)
        return put(x, y, mask)

    return Prefetcher(iter(loader), depth=2, transfer=prepare)


def _megafeed(loader, mesh, batch_size, k: int, depth=2,
              spatial: bool = False):
    """Stage K loader batches into one (K, B, ...) megabatch per yield —
    feeds :func:`make_dcgan_megastep` (K adversarial steps per XLA
    program; per-program dispatch overhead paid once per K steps —
    BENCH_NOTES round 3). Yields ``(k_actual, (xs, ys, masks))`` with
    the epoch tail as a final shorter group. (Unlike ``gat_megafeed``
    there is no batches-consumed vs batches-staged distinction: this
    loader drops nothing, so k_actual counts both.) ``spatial=True``
    stripes the frame-height axis over the model mesh axis (SP) in the
    staged transfer — see MeshContext.put_megabatch."""
    import numpy as np

    from ..data.streaming import Prefetcher

    padded = mesh.padded_batch_size(batch_size)

    def grouped():
        buf = []
        for item in loader:
            buf.append(item)
            if len(buf) == k:
                yield buf
                buf = []
        if buf:
            yield buf

    def prepare(buf):
        xs, ys, ms = [], [], []
        for x, y in buf:
            xp, yp, m = mesh.pad_to_batch_multiple(
                to_nhwc(x), to_nhwc(y), batch_size=padded)
            xs.append(xp)
            ys.append(yp)
            ms.append(m)
        staged = mesh.put_megabatch(
            np.stack(xs), np.stack(ys), np.stack(ms), spatial=spatial)
        return len(buf), staged

    return Prefetcher(grouped(), depth=depth, transfer=prepare)


def train_single_epoch(
    *,
    dataloader,
    states: GANStates,
    step: Callable,
    mesh,
    batch_size: int,
    rng_keys,
    epoch: int,
    log_every: int = 50,
    profiler=None,
    spatial: bool = False,
    shutdown=None,
    init_metrics: dict | None = None,
    megastep_fn=None,
    megastep_k: int = 0,
    resident_store=None,
    resident_megastep_fn=None,
    resident_k: int = 0,
    resident_perm_seed: int = 0,
    max_batches: int = 0,
):
    """== dcgan/train.py:80-175 (one epoch of fused adversarial steps).

    ``megastep_fn``/``megastep_k`` switch to K-steps-per-program execution
    (``make_dcgan_megastep`` + ``_megafeed``): same update sequence and
    PRNG stream up to f32 reduction order; per-program overhead paid once
    per K steps; preemption granularity becomes K steps (snapshots still
    land on exact loader-batch boundaries). Not combinable with
    ``spatial``.

    Returns ``(states, results, mid)``. Normally ``mid`` is None; when
    ``shutdown.requested`` fires mid-epoch the loop stops after the
    current step and ``mid`` carries the step-granular snapshot payload
    (batches consumed + partial metric accumulators — the v3 checkpoint
    ``mid`` subtree) with ``results`` None. ``init_metrics`` (a restored
    ``mid``) seeds the accumulators when the driver resumes inside an
    epoch; the driver is responsible for skipping the already-consumed
    batches in ``dataloader``.
    """
    import numpy as np

    pred_metrics = MetricsManager(("mse",), prefix="train")
    inc_acc_fd = IncrementalTuple()
    inc_acc_td = IncrementalTuple()
    n_done = 0
    if init_metrics is not None and int(init_metrics["batch"]) > 0:
        n_done = int(init_metrics["batch"])
        pred_metrics.metrics["mse"] += IncrementalTuple(init_metrics["mse"])
        inc_acc_fd += IncrementalTuple(init_metrics["fd_acc"])
        inc_acc_td += IncrementalTuple(init_metrics["td_acc"])
    if profiler is not None:
        profiler.start_epoch()
    # Per-batch device->host fetches cost a full round trip each (tens of
    # ms over a remote link); logs stay on device and are fetched in ONE
    # transfer at epoch end. Only the periodic loss print synchronizes.
    from ..utils.profiling import step_context

    step_cm = step_context(profiler)
    pending = []
    interrupted = False
    if resident_store is not None:
        import math

        # epoch-derived permutation key (deterministic under resume; the
        # KeySeq snapshot already sits at the interruption point, so
        # replay-skipped programs draw no dropout keys)
        perm_key = jax.random.fold_in(
            jax.random.PRNGKey(resident_perm_seed), epoch)
        progs = resident_store.epoch_programs(
            perm_key, resident_k, batch_size)
        n_prog = int(progs.shape[0])
        if max_batches:
            n_prog = min(n_prog, math.ceil(max_batches / resident_k))
        start_prog = n_done // resident_k  # mid-epoch resume, in programs
        for i in range(start_prog, n_prog):
            rngs = jnp.stack([rng_keys.next() for _ in range(resident_k)])
            with step_cm():
                states, logs = resident_megastep_fn(
                    states, resident_store.video, progs[i], rngs)
            pending.append(logs)  # *_nd masked-summed over the k steps
            n_done += resident_k
            if shutdown is not None and shutdown.requested:
                interrupted = True
                break
    elif megastep_fn is not None and megastep_k > 1:
        for k, (xs, ys, ms) in _megafeed(
            dataloader, mesh, batch_size, megastep_k, spatial=spatial
        ):
            rngs = jnp.stack([rng_keys.next() for _ in range(k)])
            with step_cm():
                states, logs = megastep_fn(states, xs, ys, ms, rngs)
            pending.append(logs)  # *_nd already summed over the k steps
            n_done += k
            if shutdown is not None and shutdown.requested:
                interrupted = True
                break
    else:
        for i, (x, y, mask) in enumerate(
            _feed(dataloader, mesh, batch_size, spatial=spatial)
        ):
            with step_cm():
                states, logs = step(states, x, y, mask, rng_keys.next())
            pending.append(logs)
            if i % log_every == 0:
                print(
                    f"Loss_FD: {float(logs['errFD']):.4f}\t"
                    f"Loss_TD: {float(logs['errTD']):.4f}\t"
                    f"Loss_G: {float(logs['errG']):.4f}\t"
                )
            if shutdown is not None and shutdown.requested:
                interrupted = True
                n_done += i + 1
                break
    for logs in jax.device_get(pending):
        pred_metrics.metrics["mse"] += IncrementalTuple(logs["train_mse_nd"])
        inc_acc_fd += IncrementalTuple(logs["fd_acc_nd"])
        inc_acc_td += IncrementalTuple(logs["td_acc_nd"])
    if interrupted:
        mid = {
            "batch": np.int64(n_done),
            "mse": pred_metrics.metrics["mse"].val.copy(),
            "fd_acc": inc_acc_fd.val.copy(),
            "td_acc": inc_acc_td.val.copy(),
        }
        print(f"[preempt] epoch {epoch} interrupted after {n_done} batches")
        return states, None, mid
    # the reference computes these per step and discards them
    # (dcgan/train.py:105-107 accumulators never reported); reporting them
    # makes the work the step already does observable
    results = pred_metrics.results() | {
        "train_fd_accuracy": inc_acc_fd.item(),
        "train_td_accuracy": inc_acc_td.item(),
    }
    if profiler is not None:
        prof_stats = profiler.end_epoch()
        print(f"Step timing: {json.dumps(prof_stats)}")
        results |= prof_stats
    return states, results, None


def test(
    dataloader,
    states: GANStates,
    eval_step: Callable,
    mesh,
    batch_size: int,
    epoch: int,
    img_path: str | None = None,
    spatial: bool = False,
):
    """== dcgan/train.py:26-77: eval metrics + first-batch visualization."""
    fd_metrics = MetricsManager(("accuracy",), prefix="frame_disc")
    td_metrics = MetricsManager(("accuracy",), prefix="temp_disc")
    pred_metrics = MetricsManager(
        ("accuracy", "precision", "recall", "mse"), prefix="pred"
    )
    pending = []
    for i, (x, y, mask) in enumerate(
        _feed(dataloader, mesh, batch_size, spatial=spatial)
    ):
        fake, logs = eval_step(states, x, y, mask)
        pending.append(logs)
        if i == 0 and img_path is not None:
            from ..utils.viz import visualize_predictions

            n = int(np.sum(np.asarray(mask)))
            visualize_predictions(
                np.moveaxis(np.asarray(x)[:n], -1, 1),
                np.moveaxis(np.asarray(y)[:n], -1, 1),
                np.moveaxis(np.asarray(fake)[:n], -1, 1),
                epoch,
                img_path,
            )
    for logs in jax.device_get(pending):
        fd_metrics.metrics["accuracy"] += IncrementalTuple(logs["fd_acc_nd"])
        td_metrics.metrics["accuracy"] += IncrementalTuple(logs["td_acc_nd"])
        pred_metrics.update_from_nd(logs["pred_nd"])
    return fd_metrics.results() | td_metrics.results() | pred_metrics.results()
