"""CycleGAN: dual generator/discriminator pairs + cycle-consistency.

The reference's cycle_gan package is an unfinished dcgan clone — no dual
generators, no cycle loss, a train.py that NameErrors at import
(cycle_gan/train.py:11-24), and a Lightning skeleton with no steps
(cycle_gan/models/lightning_model.py). Per its stated intent
(cycle_gan/README.md:6-8: "implement cycle GAN", "replace simple temp disc
with cycle gan") this module implements the real thing on the paired
frame-prediction domains:

- G : X -> Y   (context frames -> future frames, dcgan Generator arch)
- F : Y -> X   (future -> context, same arch)
- D_Y judges future frames, D_X judges context frames (FrameDiscriminator)
- losses: BCE adversarial on both pairs + lambda * (L1(F(G(x)), x)
  + L1(G(F(y)), y)) cycle consistency

as ONE fused jitted step: G/F update first against current critics, then
D_X/D_Y on detached fakes (the standard CycleGAN ordering).
"""

from __future__ import annotations


import flax.struct
import jax
import jax.numpy as jnp

from .adversarial import _apply_train_with_params
from .losses import bce, l1
from .state import NetState


@flax.struct.dataclass
class CycleGANStates:
    g_xy: NetState   # context -> future
    g_yx: NetState   # future -> context
    d_x: NetState
    d_y: NetState


def make_cyclegan_train_step(
    g_xy_model, g_yx_model, d_x_model, d_y_model,
    g_xy_tx, g_yx_tx, d_x_tx, d_y_tx,
    *, cycle_lambda: float = 10.0,
):
    body = _make_cyclegan_step_body(
        g_xy_model, g_yx_model, d_x_model, d_y_model,
        g_xy_tx, g_yx_tx, d_x_tx, d_y_tx, cycle_lambda=cycle_lambda,
    )
    return jax.jit(body, donate_argnums=(0,))


def make_cyclegan_megastep(
    g_xy_model, g_yx_model, d_x_model, d_y_model,
    g_xy_tx, g_yx_tx, d_x_tx, d_y_tx,
    *, cycle_lambda: float = 10.0,
):
    """K CycleGAN train steps fused into ONE XLA program via lax.scan —
    the same overhead-amortizing mode dcgan/conv-GAT ship
    (make_dcgan_megastep docstring has the measurement story).

    Signature: megastep(states, xs, ys, masks, rngs) with a leading K
    axis on every batch input. Returned logs: ``*_nd`` accumulator pairs
    are summed over the K steps (exact (num, denom) sums); scalar losses
    are the LAST step's, matching a periodic console print.
    """
    from .megastep import wrap_megastep

    body = _make_cyclegan_step_body(
        g_xy_model, g_yx_model, d_x_model, d_y_model,
        g_xy_tx, g_yx_tx, d_x_tx, d_y_tx, cycle_lambda=cycle_lambda,
    )
    return wrap_megastep(body)


def _make_cyclegan_step_body(
    g_xy_model, g_yx_model, d_x_model, d_y_model,
    g_xy_tx, g_yx_tx, d_x_tx, d_y_tx,
    *, cycle_lambda: float = 10.0,
):
    def step(states: CycleGANStates, x, y, mask, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)

        # ---- generators update (joint) -----------------------------------
        def g_loss_fn(g_xy_params, g_yx_params):
            fake_y, gxy_bs = _apply_train_with_params(
                g_xy_model, g_xy_params, states.g_xy.batch_stats, x,
                rngs={"dropout": k1},
            )
            fake_x, gyx_bs = _apply_train_with_params(
                g_yx_model, g_yx_params, states.g_yx.batch_stats, y,
                rngs={"dropout": k2},
            )
            cyc_x, _ = _apply_train_with_params(
                g_yx_model, g_yx_params, states.g_yx.batch_stats, fake_y,
                rngs={"dropout": k3},
            )
            cyc_y, _ = _apply_train_with_params(
                g_xy_model, g_xy_params, states.g_xy.batch_stats, fake_x,
                rngs={"dropout": k4},
            )
            p_fy = _eval_apply(d_y_model, states.d_y, fake_y).reshape(-1)
            p_fx = _eval_apply(d_x_model, states.d_x, fake_x).reshape(-1)
            adv = bce(p_fy, 1.0, mask=mask) + bce(p_fx, 1.0, mask=mask)
            cyc = l1(cyc_x, x, mask=mask) + l1(cyc_y, y, mask=mask)
            loss = adv + cycle_lambda * cyc
            return loss, (fake_x, fake_y, gxy_bs, gyx_bs, adv, cyc)

        (
            (g_loss, (fake_x, fake_y, gxy_bs, gyx_bs, adv, cyc)),
            (gxy_grads, gyx_grads),
        ) = jax.value_and_grad(g_loss_fn, argnums=(0, 1), has_aux=True)(
            states.g_xy.params, states.g_yx.params
        )
        g_xy = states.g_xy.apply_gradients(g_xy_tx, gxy_grads).replace(
            batch_stats=gxy_bs
        )
        g_yx = states.g_yx.apply_gradients(g_yx_tx, gyx_grads).replace(
            batch_stats=gyx_bs
        )

        # ---- discriminators update on detached fakes ---------------------
        fake_x_sg = jax.lax.stop_gradient(fake_x)
        fake_y_sg = jax.lax.stop_gradient(fake_y)

        def d_loss_fn(d_x_params, d_y_params):
            p_rx, dx_bs1 = _apply_train_with_params(
                d_x_model, d_x_params, states.d_x.batch_stats, x
            )
            p_fx, dx_bs2 = _apply_train_with_params(
                d_x_model, d_x_params, dx_bs1, fake_x_sg
            )
            p_ry, dy_bs1 = _apply_train_with_params(
                d_y_model, d_y_params, states.d_y.batch_stats, y
            )
            p_fy, dy_bs2 = _apply_train_with_params(
                d_y_model, d_y_params, dy_bs1, fake_y_sg
            )
            loss_x = (
                bce(p_rx.reshape(-1), 1.0, mask=mask)
                + bce(p_fx.reshape(-1), 0.0, mask=mask)
            ) / 2.0
            loss_y = (
                bce(p_ry.reshape(-1), 1.0, mask=mask)
                + bce(p_fy.reshape(-1), 0.0, mask=mask)
            ) / 2.0
            return loss_x + loss_y, (loss_x, loss_y, dx_bs2, dy_bs2)

        (
            (_, (d_x_loss, d_y_loss, dx_bs, dy_bs)),
            (dx_grads, dy_grads),
        ) = jax.value_and_grad(d_loss_fn, argnums=(0, 1), has_aux=True)(
            states.d_x.params, states.d_y.params
        )
        d_x = states.d_x.apply_gradients(d_x_tx, dx_grads).replace(
            batch_stats=dx_bs
        )
        d_y = states.d_y.apply_gradients(d_y_tx, dy_grads).replace(
            batch_stats=dy_bs
        )

        m = mask.reshape((-1,) + (1,) * (y.ndim - 1))
        mse_num = jnp.sum(((fake_y - y) ** 2) * m)
        mse_den = jnp.sum(mask) * jnp.float32(y[0].size)
        logs = {
            "g_loss": g_loss,
            "adv_loss": adv,
            "cycle_loss": cyc,
            "d_x_loss": d_x_loss,
            "d_y_loss": d_y_loss,
            "train_mse_nd": jnp.stack([mse_num, mse_den]),
        }
        return (
            CycleGANStates(g_xy=g_xy, g_yx=g_yx, d_x=d_x, d_y=d_y),
            logs,
        )

    return step


def _eval_apply(model, state: NetState, *args):
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model.apply(variables, *args, train=False)


def make_cyclegan_eval_step(g_xy_model, g_yx_model):
    @jax.jit
    def eval_step(states: CycleGANStates, x, y, mask):
        fake_y = _eval_apply(g_xy_model, states.g_xy, x)
        cyc_x = _eval_apply(g_yx_model, states.g_yx, fake_y)
        m = mask.reshape((-1,) + (1,) * (y.ndim - 1))
        mse_num = jnp.sum(((fake_y - y) ** 2) * m)
        mse_den = jnp.sum(mask) * jnp.float32(y[0].size)
        cyc_num = jnp.sum(jnp.abs(cyc_x - x) * m)
        return fake_y, {
            "pred_mse_nd": jnp.stack([mse_num, mse_den]),
            "cycle_l1_nd": jnp.stack([cyc_num, mse_den]),
        }

    return eval_step


def test(dataloader, states, eval_step, mesh, batch_size, epoch,
         img_path=None, spatial=False):
    """Streaming CycleGAN eval over one loader pass (the dcgan_trainer
    ``test`` twin): masked (num, denom) sums fetched once at the end,
    first-batch prediction grid rendered when ``img_path`` is set.
    Returns ``{"pred_mse", "cycle_l1"}``."""
    import numpy as np

    from ..utils.metrics import IncrementalTuple
    from .dcgan_trainer import _feed

    pred_mse = IncrementalTuple()
    cycle_l1 = IncrementalTuple()
    pending = []
    first = True
    for x, y, mask in _feed(dataloader, mesh, batch_size, spatial=spatial):
        fake_y, logs = eval_step(states, x, y, mask)
        pending.append(logs)
        if first and img_path is not None:
            from ..utils.viz import visualize_predictions

            n = int(np.sum(np.asarray(mask)))
            visualize_predictions(
                np.moveaxis(np.asarray(x)[:n], -1, 1),
                np.moveaxis(np.asarray(y)[:n], -1, 1),
                np.moveaxis(np.asarray(fake_y)[:n], -1, 1),
                epoch, img_path,
            )
        first = False
    for logs in jax.device_get(pending):
        pred_mse += IncrementalTuple(logs["pred_mse_nd"])
        cycle_l1 += IncrementalTuple(logs["cycle_l1_nd"])
    return {"pred_mse": pred_mse.item(), "cycle_l1": cycle_l1.item()}
