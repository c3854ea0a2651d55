"""Autoregressive multi-horizon rollout for serving.

Every frame-prediction model in this framework maps a context window to
an equally-shaped prediction window (DCGAN generator: 4 frames in → 4
frames out, reference ``/root/reference/dcgan/model.py:55-76``; GAT/UNet
families: ``(B,H,W,T=4,V) → (B,H,W,4,V)``, reference
``/root/reference/convolutional_gat/train.py:191-205``). The reference
only ever predicts ONE window ahead; nowcasting deployments want a longer
horizon — predict 4 frames, feed them back as the new context, repeat.

The TPU-native formulation is a :func:`jax.lax.scan` over the model
forward: K rollout steps compile into ONE XLA program, so a K-step
horizon costs one dispatch instead of K host round-trips (the same
dispatch-amortization physics as the training megastep — BENCH_NOTES
"Pushing the plateau"). The rolled function is jittable and exports
through :mod:`.export` like any forward, producing a single StableHLO
artifact that emits the whole horizon.

Composes with PTQ (:mod:`.quantize`): the quantized generator's sigmoid
head keeps every intermediate window in [0, 1] — the calibrated input
domain — so quantization error does not leave calibrated range as the
rollout deepens.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def make_rollout(
    fwd: Callable,
    steps: int,
    concat_axis: int | None = None,
    final_only: bool = False,
) -> Callable:
    """Wrap ``fwd`` into a K-step autoregressive rollout.

    ``fwd(x) -> y`` must be shape-preserving (``y.shape == x.shape``) —
    the prediction window re-enters as the next context window. Checked
    via :func:`jax.eval_shape` on the first call of the returned closure
    (the earliest point an input shape exists), so misuse fails with a
    clear message before the scan traces.

    Returns ``rolled(x)`` emitting the stacked horizon
    ``(B, steps, *x.shape[1:])`` — window k at index k — or, with
    ``concat_axis``, the windows concatenated along that axis of ``x``
    (e.g. ``-1`` for the DCGAN frames-as-channels layout → a
    ``(B, H, W, 4*steps)`` film strip; ``-2`` for the GAT ``(B,H,W,T,V)``
    layout).

    ``final_only=True`` emits just window K (``x``-shaped): the
    "forecast K windows ahead" artifact. Besides the smaller reply, the
    intermediate windows never leave the device — on remote-attached
    serving the horizon's transfer bytes dominate wall time
    (scripts/probe_rollout_serving.py), so this mode is near-flat in K.
    """
    if steps < 1:
        raise ValueError(f"rollout steps must be >= 1, got {steps}")
    if final_only and concat_axis is not None:
        raise ValueError("final_only emits one window; concat_axis "
                         "does not apply")

    def rolled(x):
        out = jax.eval_shape(fwd, x)
        if out.shape != x.shape:
            raise ValueError(
                f"rollout needs a shape-preserving forward; got "
                f"{x.shape} -> {out.shape}")

        if final_only:
            def body_carry(h, _):
                return fwd(h), None

            h, _ = lax.scan(body_carry, x, None, length=steps)
            return h

        def body(h, _):
            y = fwd(h)
            return y, y

        _, ys = lax.scan(body, x, None, length=steps)
        ys = jnp.moveaxis(ys, 0, 1)  # (K, B, ...) -> (B, K, ...)
        if concat_axis is None:
            return ys
        if not -x.ndim <= concat_axis < x.ndim:
            raise ValueError(f"concat_axis {concat_axis} out of range for "
                             f"a {x.ndim}-d input")
        if concat_axis % x.ndim == 0:
            raise ValueError("concat_axis cannot be the batch axis")
        # windows concatenated along concat_axis of the ORIGINAL layout
        return jnp.concatenate([ys[:, k] for k in range(steps)],
                               axis=concat_axis)

    return rolled
