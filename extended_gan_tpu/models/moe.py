"""Switch-style mixture-of-experts FFN for spatial feature maps.

The reference has no MoE (it is a single-device torch codebase, SURVEY.md
section 2.7); this is a TPU-native capacity extension: conditional compute
that grows parameters E-fold while keeping per-token FLOPs constant, with
the expert axis designed to shard over the device mesh (expert parallelism,
see :mod:`extended_gan_tpu.parallel.expert`).

Design follows the TPU MoE literature (Switch Transformer / GShard routing):

- **top-1 routing** with a per-expert **capacity** bound so every tensor
  shape is static — a hard requirement under jit (no data-dependent
  shapes on TPU),
- **dense dispatch**: routing is expressed as two one-hot einsum tensors
  (``dispatch``/``combine`` of shape (tokens, E, capacity)) contracted on
  the MXU, never as a gather/scatter scalar loop,
- **load-balance auxiliary loss** (Switch eq. 4): ``E * sum_e f_e * p_e``
  where ``f_e`` is the fraction of tokens routed to expert ``e`` and
  ``p_e`` the mean router probability — minimized (=1) at uniform routing,
- tokens that overflow an expert's capacity are **dropped** (contribute
  zero from the expert) and survive through the residual connection.

The math core (:func:`route_top1`, :func:`expert_ffn`) is pure-functional
so the expert-parallel ``shard_map`` path in ``parallel/expert.py`` can
reuse exactly the same code the single-device flax module runs.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def expert_capacity(n_tokens: int, n_experts: int,
                    capacity_factor: float) -> int:
    """Static per-expert token capacity (>= 1)."""
    return max(1, math.ceil(capacity_factor * n_tokens / n_experts))


def route_top1(tokens: jax.Array, router_w: jax.Array, capacity: int):
    """Top-1 capacity-bounded routing.

    Args:
      tokens: (N, C) float tokens.
      router_w: (C, E) router weights.
      capacity: per-expert capacity (static int).

    Returns:
      dispatch: (N, E, capacity) one-hot dispatch tensor (0/1).
      combine:  (N, E, capacity) dispatch scaled by the router gate.
      aux:      scalar load-balance loss (1.0 == perfectly uniform).
    """
    n, _ = tokens.shape
    e = router_w.shape[-1]
    # Router math in f32 regardless of activation dtype: the argmax and
    # the aux loss are statistics, not throughput.
    logits = tokens.astype(jnp.float32) @ router_w.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)               # (N, E)
    expert_index = jnp.argmax(probs, axis=-1)             # (N,)
    onehot = jax.nn.one_hot(expert_index, e, dtype=jnp.float32)
    gate = jnp.sum(probs * onehot, axis=-1)               # (N,)

    # Position of each token within its expert's queue (0-based), in token
    # order — the deterministic GShard tie-break.
    position = jnp.cumsum(onehot, axis=0) * onehot        # (N, E), 1-based
    pos_in_expert = jnp.sum(position, axis=-1) - 1.0      # (N,)
    keep = (pos_in_expert < capacity) & (pos_in_expert >= 0)

    pos_onehot = jax.nn.one_hot(
        pos_in_expert.astype(jnp.int32), capacity, dtype=jnp.float32)
    dispatch = onehot[:, :, None] * pos_onehot[:, None, :]
    dispatch = dispatch * keep[:, None, None].astype(jnp.float32)
    combine = dispatch * gate[:, None, None]

    # Switch load-balance loss: E * sum_e fraction_e * mean_prob_e.
    fraction = jnp.mean(onehot, axis=0)                   # (E,)
    mean_prob = jnp.mean(probs, axis=0)                   # (E,)
    aux = e * jnp.sum(fraction * mean_prob)
    return dispatch, combine, aux


def expert_ffn(w1, b1, w2, b2, expert_inputs, dtype=jnp.float32):
    """Apply every expert's 2-layer relu MLP to its token slots.

    Args:
      w1: (E, C, H); b1: (E, H); w2: (E, H, C); b2: (E, C).
      expert_inputs: (E, capacity, C).

    Returns: (E, capacity, C).

    One batched einsum per layer — E expert matmuls fused into a single
    MXU contraction, never a Python loop over experts.
    """
    x = expert_inputs.astype(dtype)
    h = jnp.einsum("ecd,edh->ech", x, w1.astype(dtype)) + (
        b1.astype(dtype)[:, None, :])
    h = nn.relu(h)
    y = jnp.einsum("ech,ehd->ecd", h, w2.astype(dtype)) + (
        b2.astype(dtype)[:, None, :])
    return y


def moe_apply_dense(params: dict, tokens: jax.Array, capacity: int,
                    dtype=jnp.float32):
    """Single-program MoE forward: route, dispatch, expert FFN, combine.

    ``params`` holds ``router`` (C, E), ``w1/b1/w2/b2`` with leading expert
    axes. Returns ``(out (N, C), aux scalar, load (E,))``; ``out`` excludes
    the residual (the caller adds it), ``load`` counts the tokens each
    expert actually received (post-capacity) — a routing diagnostic, not a
    loss term.
    """
    dispatch, combine, aux = route_top1(tokens, params["router"], capacity)
    expert_inputs = jnp.einsum(
        "nec,nd->ecd", dispatch.astype(dtype), tokens.astype(dtype))
    expert_outputs = expert_ffn(
        params["w1"], params["b1"], params["w2"], params["b2"],
        expert_inputs, dtype=dtype)
    out = jnp.einsum(
        "nec,ecd->nd", combine.astype(dtype), expert_outputs)
    load = jnp.sum(dispatch, axis=(0, 2))  # kept tokens per expert
    return out, aux, load


class SwitchMoE(nn.Module):
    """Residual MoE FFN over the tokens of an (B, H, W, C) feature map.

    ``y = x + MoE(LN-free tokens)``; the load-balance aux loss is sowed
    into the ``"losses"`` collection as ``moe_aux`` (trainers read it with
    ``mutable=["losses"]`` and add ``aux_weight * mean``).
    """

    num_experts: int = 8
    hidden_mult: int = 2
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        e = self.num_experts
        hid = c * self.hidden_mult
        params = {
            "router": self.param(
                "router", nn.initializers.lecun_normal(), (c, e)),
            "w1": self.param(
                "w1", nn.initializers.lecun_normal(), (e, c, hid)),
            "b1": self.param("b1", nn.initializers.zeros, (e, hid)),
            "w2": self.param(
                "w2", nn.initializers.lecun_normal(), (e, hid, c)),
            "b2": self.param("b2", nn.initializers.zeros, (e, c)),
        }
        tokens = x.reshape(b * h * w, c)
        cap = expert_capacity(b * h * w, e, self.capacity_factor)
        out, aux, load = moe_apply_dense(
            params, tokens, cap, dtype=self.dtype)
        self.sow("losses", "moe_aux", aux,
                 reduce_fn=lambda prev, cur: prev + cur,
                 init_fn=lambda: jnp.zeros((), jnp.float32))
        # Routing diagnostic: tokens each expert received. A no-op unless
        # the caller applies with mutable=["routing"] (scripts/
        # probe_moe_regimes.py reads it for the per-regime histograms).
        self.sow("routing", "expert_load", load,
                 reduce_fn=lambda prev, cur: prev + cur,
                 init_fn=lambda: jnp.zeros((e,), jnp.float32))
        return x + out.reshape(b, h, w, c).astype(x.dtype)
