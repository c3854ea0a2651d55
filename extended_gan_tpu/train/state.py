"""Train state containers.

One compiled program owns the whole update (params + BN stats + optimizer
moments); these pytree dataclasses are what flows through it. The reference
keeps this state implicitly inside ``nn.Module``/``optim.Adam`` objects
(dcgan/train.py:205-236); here it is explicit and functional so the entire
G/D adversarial update fuses into a single ``jax.jit`` program and so Orbax
can checkpoint/restore *everything* (the reference only saved model weights,
convolutional_gat/train.py:151-155 — no resume).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class NetState:
    """State of one network: parameters, BatchNorm running stats, optimizer
    moments. The apply_fn/tx live outside (static, in the step closure)."""

    params: Any
    batch_stats: Any
    opt_state: Any

    def apply_gradients(self, tx: optax.GradientTransformation, grads):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(params=new_params, opt_state=new_opt_state)


def create_net_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_input,
    *,
    train: bool = False,
    extra_apply_kwargs: dict | None = None,
) -> NetState:
    """Initialize a flax module + optimizer into a NetState.

    The whole init (param sampling + optimizer-state zeros) runs as ONE
    jitted program — eager init dispatches each op separately, which is
    pathologically slow on remotely-compiled TPU backends.
    """
    kwargs = dict(extra_apply_kwargs or {})

    @jax.jit
    def _init(rng):
        variables = model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            sample_input,
            train=train,
            **kwargs,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return params, batch_stats, tx.init(params)

    params, batch_stats, opt_state = _init(rng)
    return NetState(params=params, batch_stats=batch_stats,
                    opt_state=opt_state)


def param_count(state_or_params) -> int:
    params = getattr(state_or_params, "params", state_or_params)
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
