"""Lightning-style TrainModule/Trainer abstraction (the finished version of
the reference's cycle_gan/models/lightning_model.py skeleton)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from extended_gan_tpu.train.module import TrainModule, Trainer


class ToyRegression(TrainModule):
    """y = Wx fit by SGD — smallest thing that exercises the loop."""

    def __init__(self):
        self.tx = optax.sgd(0.1)

    def configure(self, rng):
        w = jax.random.normal(rng, (4, 1))
        return {"w": w, "opt": self.tx.init(w)}

    def training_step(self, state, batch, rng):
        x, y = batch

        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(state["w"])
        updates, opt = self.tx.update(g, state["opt"], state["w"])
        return (
            {"w": optax.apply_updates(state["w"], updates), "opt": opt},
            {"loss": loss},
        )

    def validation_step(self, state, batch):
        x, y = batch
        return {"val_loss": jnp.mean((x @ state["w"] - y) ** 2)}


def test_trainer_fit_converges():
    rng = np.random.RandomState(0)
    w_true = rng.randn(4, 1).astype(np.float32)
    x = rng.randn(64, 4).astype(np.float32)
    y = x @ w_true

    def data():
        for i in range(0, 64, 8):
            yield (x[i : i + 8], y[i : i + 8])

    module = ToyRegression()
    trainer = Trainer(seed=0, log_every=100)
    state, history = trainer.fit(module, data, data, epochs=30)
    assert history[-1]["val_loss"] < 1e-2
