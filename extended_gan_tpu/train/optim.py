"""Optimizers and LR schedules.

Optax equivalents of everything the reference instantiates:

- Adam(lr, betas=(0.5, 0.999)) for GAN nets (dcgan/train.py:227-236),
- Adam(lr, weight_decay=0.01) for conv-GAT (convolutional_gat/train.py:212)
  — note torch's Adam ``weight_decay`` is L2-added-to-gradient *before* the
  moment updates, not AdamW; ``add_decayed_weights`` placed before
  ``scale_by_adam`` reproduces that exactly,
- StepLR(step_size, gamma) and ReduceLROnPlateau(patience=0, factor=0.5)
  (convolutional_gat/train.py:213-220) as host-side schedulers that mutate
  the injected learning rate between epochs, so the compiled step never
  recompiles on an LR change.
"""

from __future__ import annotations

import optax


def adam(
    learning_rate: float,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    # torch-Adam semantics: grad += wd * param BEFORE the moment updates.
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            *(
                ([optax.add_decayed_weights(weight_decay)] if weight_decay else [])
                + [
                    optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                    optax.scale(-1.0),
                    optax.scale(learning_rate),
                ]
            )
        )
    )(learning_rate=learning_rate)


def sgd(learning_rate: float, *, momentum: float = 0.0, weight_decay: float = 0.0):
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            *(
                ([optax.add_decayed_weights(weight_decay)] if weight_decay else [])
                + [
                    optax.trace(decay=momentum) if momentum else optax.identity(),
                    optax.scale(-1.0),
                    optax.scale(learning_rate),
                ]
            )
        )
    )(learning_rate=learning_rate)


OPTIMIZERS = {"adam": adam, "sgd": sgd}


def make_optimizer(name: str, learning_rate: float, **kwargs):
    return OPTIMIZERS[name.lower()](learning_rate, **kwargs)


# --------------------------------------------------------------------------
# Host-side LR control over injected hyperparams.
# --------------------------------------------------------------------------
def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    import jax
    import jax.numpy as jnp

    old = opt_state.hyperparams["learning_rate"]
    new = jnp.asarray(lr, dtype=getattr(old, "dtype", jnp.float32))
    if hasattr(old, "sharding"):
        new = jax.device_put(new, old.sharding)
    opt_state.hyperparams["learning_rate"] = new
    return opt_state


class StepLR:
    """torch.optim.lr_scheduler.StepLR equivalent (epoch-granular)."""

    def __init__(self, base_lr: float, step_size: int, gamma: float):
        self.base_lr = base_lr
        self.step_size = step_size
        self.gamma = gamma
        self.epoch = 0

    def step(self, _metric: float | None = None) -> float:
        self.epoch += 1
        return self.current()

    def current(self) -> float:
        return self.base_lr * self.gamma ** (self.epoch // self.step_size)


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau(mode="min", patience=0, factor=0.5)
    equivalent (convolutional_gat/train.py:218-220)."""

    def __init__(
        self,
        base_lr: float,
        *,
        factor: float = 0.5,
        patience: int = 0,
        mode: str = "min",
        threshold: float = 1e-4,
    ):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.mode = mode
        # torch's default rel threshold: an epoch only counts as improved
        # if it beats best by >1e-4 RELATIVE — a strict `<` would disagree
        # with the reference's scheduler on near-tie val losses and fork
        # the LR schedule 2x from that epoch on
        self.threshold = threshold
        self.best: float | None = None
        self.num_bad = 0

    def step(self, metric: float) -> float:
        improved = self.best is None or (
            metric < self.best * (1.0 - self.threshold)
            if self.mode == "min"
            else metric > self.best * (1.0 + self.threshold)
        )
        if improved:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr

    def current(self) -> float:
        return self.lr
