"""Loss functions matching the reference's torch criteria bit-for-bit.

- :func:`bce` == torch.nn.BCELoss (mean reduction, log clamped at -100:
  https://pytorch.org/docs/stable/generated/torch.nn.BCELoss.html — the
  clamp is part of torch's documented semantics and matters for saturated
  discriminators),
- :func:`mse` == torch.nn.MSELoss,
- masked variants for fixed-shape padded batches (the TPU-side replacement
  for the reference's ragged last batches).
"""

from __future__ import annotations

import jax.numpy as jnp


# torch BCELoss clamps the LOG at -100; differentiating
# jnp.maximum(jnp.log(0), -100) yields 0 * inf = NaN the moment a saturated
# discriminator's sigmoid underflows to exactly 0 (bf16 training reaches
# this within an epoch). The where-form below keeps torch's value (-100 at
# p=0; exact log for any normal float) with a finite, branch-selected
# gradient. XLA flushes f32 subnormals, so the cutoff is the min normal.
_MIN_NORMAL = 1.1754944e-38


def _clamped_log(x):
    safe = jnp.maximum(x, _MIN_NORMAL)
    return jnp.where(x < _MIN_NORMAL, -100.0, jnp.log(safe))


def bce(p, target, *, mask=None):
    """Binary cross-entropy on probabilities (post-sigmoid), mean-reduced."""
    p = p.astype(jnp.float32)
    target = jnp.broadcast_to(jnp.asarray(target, jnp.float32), p.shape)
    per = -(target * _clamped_log(p) + (1.0 - target) * _clamped_log(1.0 - p))
    if mask is None:
        return jnp.mean(per)
    mask = jnp.broadcast_to(mask.reshape((-1,) + (1,) * (per.ndim - 1)), per.shape)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def mse(y_hat, y, *, mask=None):
    y_hat = y_hat.astype(jnp.float32)
    y = y.astype(jnp.float32)
    per = (y_hat - y) ** 2
    if mask is None:
        return jnp.mean(per)
    mask = jnp.broadcast_to(mask.reshape((-1,) + (1,) * (per.ndim - 1)), per.shape)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l1(y_hat, y, *, mask=None):
    per = jnp.abs(y_hat.astype(jnp.float32) - y.astype(jnp.float32))
    if mask is None:
        return jnp.mean(per)
    mask = jnp.broadcast_to(mask.reshape((-1,) + (1,) * (per.ndim - 1)), per.shape)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


CRITERIA = {"mse": mse, "bce": bce, "l1": l1}
