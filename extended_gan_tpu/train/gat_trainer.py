"""conv-GAT / U-Net MSE trainer.

Parity with /root/reference/convolutional_gat/train.py:

- train step loss: MSE(y_hat, y) - 0.0005 * mean(y_hat)  (:131, the
  sparsity bonus),
- batches with <= 1 sample are skipped in train AND eval (:127, :52),
- eval (:28-91): predictions and targets are power-denormalized
  (y ** (1/loader.power)), the binarization threshold is the MEDIAN OF THE
  UNIQUE VALUES of the denormalized target batch (:60-61 — data-dependent;
  computed host-side here since the batch originates on host anyway),
  accuracy/precision/recall via the scaled thresholded metrics
  (utils.py:135-167, NaNs dropped :67-68), plus a denormalized MSE scaled
  by loader.normalizing_max (:70-73),
- per-epoch: fresh loaders, LR print, val eval, scheduler.step(val_loss),
  history.json dump, best-val checkpoint (:109-155).

The whole train step (forward, loss, backward, Adam-with-L2, metric sums)
is one jitted XLA program; the eval math runs jitted with the threshold as
a traced scalar input so the data-dependent threshold never retriggers
compilation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .state import NetState


def _make_gat_step_body(model, tx, *, remat: bool = False,
                        criterion: str = "mse",
                        moe_aux_weight: float = 0.0,
                        forward_override=None):
    """The un-jitted single-step update shared by
    :func:`make_gat_train_step` (one program per step, donated state) and
    :func:`make_gat_megastep` (K steps scanned into one program).

    ``moe_aux_weight > 0`` (MoE models, models/moe.py): the sowed
    ``"losses"`` collection (Switch load-balance aux) is made mutable and
    its sum joins the loss with that weight.

    ``forward_override(params, x) -> y_hat`` swaps the forward pass while
    keeping every other piece (loss, sparsity bonus, masking, optimizer
    update, running-loss accumulators) byte-identical — how the
    pipeline-parallel path (parallel/pipeline.py) trains with the shared
    update semantics. Override forwards carry no batch_stats / dropout /
    sowed-aux plumbing (true of the stacked GAT families PP covers)."""
    if criterion not in ("mse", "l1"):
        raise ValueError(
            f"unsupported criterion {criterion!r}; choose 'mse' or 'l1'"
        )

    def forward(params, batch_stats, x, rng, has_bs):
        variables = {"params": params}
        if has_bs:
            variables["batch_stats"] = batch_stats
        muts = (["batch_stats"] if has_bs else []) + (
            ["losses"] if moe_aux_weight else [])
        return model.apply(
            variables, x, train=True,
            mutable=muts if muts else False,
            rngs={"dropout": rng},
        )

    fwd = (
        jax.checkpoint(forward, static_argnums=(4,)) if remat else forward
    )

    def step(state: NetState, x, y, mask, rng):
        m = mask.reshape((-1,) + (1,) * (y.ndim - 1))

        def loss_fn(params):
            if forward_override is not None:
                y_hat, updates = forward_override(params, x), {}
                new_bs = state.batch_stats
            else:
                has_bs = bool(state.batch_stats)
                out = fwd(params, state.batch_stats, x, rng, has_bs)
                if has_bs or moe_aux_weight:
                    y_hat, updates = out
                    new_bs = updates.get("batch_stats", state.batch_stats)
                else:
                    y_hat, updates = out, {}
                    new_bs = state.batch_stats
            n_el = jnp.maximum(jnp.sum(mask), 1.0) * jnp.float32(y[0].size)
            err = ((y_hat - y) ** 2 if criterion == "mse"
                   else jnp.abs(y_hat - y))
            sq = jnp.sum(err * m)
            mean_pred = jnp.sum(y_hat * m) / n_el
            loss = sq / n_el - 0.0005 * mean_pred  # reference :131
            if moe_aux_weight:
                aux = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b),
                    updates.get("losses", {}), jnp.float32(0.0))
                loss = loss + moe_aux_weight * aux
            return loss, (y_hat, new_bs, sq)

        (loss, (y_hat, new_bs, sq)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(tx, grads).replace(batch_stats=new_bs)
        # running_loss contribution: sum((y_hat-y)^2)/prod(shape[1:])  (:136)
        running = sq / jnp.float32(y[0].size)
        return state, {"loss": loss, "running_nd": jnp.stack(
            [running, jnp.sum(mask)])}

    return step


def make_gat_train_step(model, tx, *, remat: bool = False,
                        criterion: str = "mse",
                        moe_aux_weight: float = 0.0,
                        forward_override=None):
    """One fused XLA program per train step (donated state).

    remat=True rematerializes the forward during the backward pass
    (jax.checkpoint) — trades recompute FLOPs for activation HBM, the knob
    that lets the 4M-param SmaAt-UNet train at large spatial sizes. It is
    a MEMORY knob, not a throughput knob: at the headline conv-GAT
    geometry it measured 0.73x (bf16 b128, scripts/probe_gat_remat.py —
    the recomputed conv intermediates still materialize through HBM;
    BENCH_NOTES round 5).

    ``criterion`` (config key CRITERION; the reference passes an arbitrary
    torch loss module to train(), convolutional_gat/train.py:131): "mse"
    (the only one the reference's configs use) or "l1". Unknown names
    raise — silently training MSE under another label is worse."""
    body = _make_gat_step_body(model, tx, remat=remat, criterion=criterion,
                               moe_aux_weight=moe_aux_weight,
                               forward_override=forward_override)
    return functools.partial(jax.jit, donate_argnums=(0,))(body)


def make_gat_megastep(model, tx, *, remat: bool = False,
                      criterion: str = "mse",
                      moe_aux_weight: float = 0.0):
    """K train steps fused into ONE XLA program via lax.scan.

    The per-PROGRAM dispatch/transport overhead is paid once per K steps
    instead of once per step — decisive on remote-attached chips where
    that overhead is milliseconds (BENCH_NOTES round 3: the relay charges
    ~4-6 ms per enqueued program, so K=16 lifts the true end-to-end
    conv-GAT rate by an order of magnitude). On a locally-attached chip
    (~10-100 us/program) it is near-neutral: the scanned state carry adds
    copies the donated single step avoids (round-2 megastep analysis).

    Signature: ``megastep(state, xs, ys, masks, rngs)`` with a leading K
    axis on every batch input (``mesh.put_megabatch``). Logs: ``*_nd``
    accumulator pairs are summed over the K steps (exact — pure
    (num, denom) sums); scalar losses are the LAST step's. Numerics match
    K sequential single steps fed the same rng sequence up to f32
    reduction-order (tests/test_gat_megastep.py).
    """
    from .megastep import wrap_megastep

    body = _make_gat_step_body(model, tx, remat=remat, criterion=criterion,
                               moe_aux_weight=moe_aux_weight)
    return wrap_megastep(body)


def _eval_metrics(y_hat, y, mask, threshold, normalizing_max, power):
    """The per-batch eval metric math — shared by the streaming eval step
    and the device-resident eval program (data/resident.py), so the two
    paths cannot drift."""
    inv = 1.0 / power
    y_p = y ** inv if power != 1.0 else y
    y_hat_p = jnp.maximum(y_hat, 0.0) ** inv if power != 1.0 else y_hat
    m = mask.reshape((-1,) + (1,) * (y.ndim - 1))
    per_sample = jnp.float32(y[0].size)
    n_valid = jnp.sum(mask)
    sq = jnp.sum(((y_p - y_hat_p) ** 2) * m)
    denorm_sq = jnp.sum((((y_p - y_hat_p) * normalizing_max) ** 2) * m)
    # mask-exact thresholded metrics (== utils.py:135-167 on the valid
    # rows; prec/rec scaled by the VALID batch length)
    mb = jnp.broadcast_to(m, y.shape)
    yb = (y_p >= threshold).astype(jnp.float32)
    pb = (y_hat_p >= threshold).astype(jnp.float32)
    acc = jnp.sum((yb == pb) * mb) / per_sample
    tp = jnp.sum((pb == 1) * (yb == 1) * mb)
    fp = jnp.sum((pb == 1) * (yb == 0) * mb)
    fn = jnp.sum((pb == 0) * (yb == 1) * mb)
    prec = tp / (tp + fp) * n_valid
    rec = tp / (tp + fn) * n_valid
    return {
        "loss_num": sq / per_sample,
        "denorm_num": denorm_sq / per_sample,
        "acc": acc,
        "prec": prec,
        "rec": rec,
        "n": n_valid,
    }


def make_gat_eval_step(model, forward_override=None):
    """``forward_override(params, x) -> y_hat`` swaps the forward (the PP
    path) while the metric math stays shared."""

    @functools.partial(jax.jit, static_argnames=("power",))
    def eval_step(state: NetState, x, y, mask, threshold, normalizing_max,
                  *, power: float = 1.0):
        if forward_override is not None:
            y_hat = forward_override(state.params, x)
        else:
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            y_hat = model.apply(variables, x, train=False)
        out = _eval_metrics(y_hat, y, mask, threshold, normalizing_max,
                            power)
        out["y_hat"] = y_hat
        return out

    return eval_step


def _prep_gat_batch(mesh, x, y, spatial=False, batch_size=None):
    # pad to the NOMINAL batch size when known: padding the ragged last
    # batch only up to a DP multiple of its own length creates a second
    # input shape and a full extra XLA compile of the (donated) step
    padded = mesh.padded_batch_size(max(batch_size or 0, len(x)))
    x, y, mask = mesh.pad_to_batch_multiple(
        np.asarray(x, np.float32), np.asarray(y, np.float32),
        batch_size=padded,
    )
    put = mesh.put_batch_spatial if spatial else mesh.put_batch
    return put(x, y, mask)


def gat_feed(loader, mesh, *, spatial=False, batch_size=None, depth=2):
    """Background host->device feed for the GAT loaders.

    Pads, lays out, and shards each (x, y) batch OFF the training thread
    (the role :class:`~extended_gan_tpu.data.streaming.Prefetcher` plays
    for the GAN trainers' ``_feed``): loader IO + the host->device
    transfer overlap device compute instead of serializing with it — a
    synchronous per-batch ``device_put`` costs a full link RTT per step
    over a remote-attached chip. Yields ``(n_samples, (xd, yd, mask))``;
    ``n_samples <= 1`` batches yield ``(n, None)`` so the caller can skip
    them (reference convolutional_gat/train.py:119-120 semantics).
    """
    from ..data.streaming import Prefetcher

    def prepare(item):
        x, y = item
        n = len(x)
        if n <= 1:
            return n, None
        return n, _prep_gat_batch(mesh, x, y, spatial=spatial,
                                  batch_size=batch_size)

    return Prefetcher(iter(loader), depth=depth, transfer=prepare)


def gat_megafeed(loader, mesh, k: int, *, batch_size=None, depth=2,
                 spatial: bool = False):
    """Stage K loader batches into one (K, B, ...) megabatch per yield.

    Feeds :func:`make_gat_megastep`: K reference steps execute as ONE XLA
    program, paying the per-program dispatch/transport overhead once per
    K steps (decisive on remote-attached chips — BENCH_NOTES round 3).
    Batches with <= 1 samples are dropped exactly as the single-step loop
    drops them (reference train.py:119-120). Yields
    ``(consumed, n_samples, k_actual, (xs, ys, masks))`` where
    ``consumed`` counts loader batches drawn (including dropped ones —
    the loader-cursor unit mid-epoch resume uses); the epoch tail yields
    a final shorter group (k_actual < k -> one extra XLA specialization).
    ``spatial=True`` stripes the frame-height axis of the staged
    megabatch over the model mesh axis (SP), composing the two modes.
    """

    def grouped():
        buf, consumed = [], 0
        for x, y in loader:
            consumed += 1
            if len(x) <= 1:
                continue
            buf.append((x, y))
            if len(buf) == k:
                yield consumed, buf
                buf, consumed = [], 0
        if buf:
            yield consumed, buf

    def prepare(item):
        consumed, buf = item
        padded = mesh.padded_batch_size(
            max(batch_size or 0, max(len(x) for x, _ in buf)))
        xs, ys, ms = [], [], []
        n_samples = 0
        for x, y in buf:
            n_samples += len(x)
            xp, yp, m = mesh.pad_to_batch_multiple(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                batch_size=padded,
            )
            xs.append(xp)
            ys.append(yp)
            ms.append(m)
        staged = mesh.put_megabatch(
            np.stack(xs), np.stack(ys), np.stack(ms), spatial=spatial)
        return consumed, n_samples, len(buf), staged

    from ..data.streaming import Prefetcher

    return Prefetcher(grouped(), depth=depth, transfer=prepare)


def test(eval_step, state, loader, mesh, *, flag: str = "val",
         spatial: bool = False, batch_size: int | None = None):
    """Validation-set evaluation == convolutional_gat/train.py:28-91."""
    if batch_size is None:
        batch_size = getattr(loader, "batch_size", None)
    running_loss = running_acc = running_prec = running_rec = 0.0
    running_denorm = 0.0
    total = 0
    power = float(getattr(loader, "power", 1.0))
    norm_max = float(getattr(loader, "normalizing_max", 1.0))

    from ..data.streaming import Prefetcher

    def prepare(item):
        x, y = item
        n = len(x)
        if n <= 1:
            return n, None, None
        y_p = np.asarray(y, np.float32) ** (1.0 / power)
        unique = np.unique(y_p)
        threshold = float(unique[int(len(unique) * 0.5)])  # :60-61
        return n, threshold, _prep_gat_batch(
            mesh, x, y, spatial=spatial, batch_size=batch_size)

    pending = []  # scalar metrics stay on device; ONE fetch at the end
    for n, threshold, batch in Prefetcher(iter(loader), depth=2,
                                          transfer=prepare):
        if n <= 1:
            continue
        xd, yd, mask = batch
        out = eval_step(state, xd, yd, mask, threshold, norm_max,
                        power=power)
        pending.append({k: v for k, v in out.items() if k != "y_hat"})
        total += n
    for out in jax.device_get(pending):
        running_loss += float(out["loss_num"])
        running_denorm += float(out["denorm_num"])
        running_acc += float(out["acc"])
        prec, rec = float(out["prec"]), float(out["rec"])
        running_prec += prec if not np.isnan(prec) else 0.0
        running_rec += rec if not np.isnan(rec) else 0.0
    total = max(total, 1)
    return {
        "val_loss": running_loss / total,
        "val_acc": running_acc / total,
        "val_prec": running_prec / total,
        "val_rec": running_rec / total,
        "val_denorm_mse": running_denorm / total,
    }
