"""Shared megastep wrapper: K train steps scanned into ONE XLA program.

All three workload trainers (dcgan, conv-GAT, CycleGAN) wrap their step
body with the same schedule and log-aggregation rule; this module owns
the single copy. Log semantics: ``*_nd`` (num, denom) accumulator pairs
are summed over the K steps — exact, they are pure sums — while scalar
losses keep the LAST step's value, matching what a periodic console
print would have shown.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def wrap_megastep(body):
    """``body(state, x, y, mask, rng) -> (state, logs)`` (state donated)
    becomes ``megastep(state, xs, ys, masks, rngs)`` with a leading K
    axis on every batch input."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def megastep(state, xs, ys, masks, rngs):
        def scan_body(s, inp):
            x, y, m, r = inp
            s, logs = body(s, x, y, m, r)
            return s, logs

        state, stacked = jax.lax.scan(
            scan_body, state, (xs, ys, masks, rngs)
        )
        logs = {
            k: jnp.sum(v, axis=0) if k.endswith("_nd") else v[-1]
            for k, v in stacked.items()
        }
        return state, logs

    return megastep
