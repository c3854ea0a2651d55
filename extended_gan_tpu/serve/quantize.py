"""Post-training int8 quantization (PTQ) for the serving path.

The reference has no quantization story (pure f32 PyTorch end to end;
SURVEY.md §2.7 lists no native/perf components at all). This module is
beyond-parity TPU-native serving work: the v5e MXU executes
int8 x int8 -> int32 contractions at twice the bf16 rate, and weight-only
int8 cuts the weight bytes baked into an exported StableHLO artifact 4x.

Pipeline (classic PTQ, inference graph only — BN uses running stats,
dropout is off):

1. :func:`fold_generator_bn` — inference BatchNorm is a per-channel
   affine, so it folds into the preceding conv's kernel/bias exactly
   (f32 algebra). The DCGAN/CycleGAN generator
   (models/dcgan.py::Generator, reference /root/reference/dcgan/model.py
   :55-76) collapses to five plain conv+act layers.
2. per-layer quantization — kernels per-OUT-CHANNEL symmetric int8
   (scale = absmax/127); activations (``w8a8`` mode) per-tensor symmetric
   int8 with static scales calibrated on a representative batch.
3. the quantized forward is a plain jittable closure over int8 constants,
   so it exports through :mod:`.export` like any forward — the artifact
   carries int8 weights.

Modes:

- ``"w8"`` (weight-only): kernels stored int8, dequantized to the compute
  dtype at run time; arithmetic unchanged. ~4x smaller weights, numerics
  within per-channel rounding of f32 (the DCGAN generator measures ~1e-3
  max output error — tests/test_quantize.py).
- ``"w8a8"`` (full int8): both operands int8, int32 accumulation — the
  MXU-native integer path. Static activation scales; numerics bounded by
  the calibration coverage (tests pin the error budget).

The generator's sigmoid head keeps outputs in [0, 1] = its input domain,
so serving chains (autoregressive rollout) stay in calibrated range.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-5  # TorchBatchNorm epsilon (ops/norm.py)


def _act(name: str) -> Callable:
    return {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "identity": lambda x: x,
    }[name]


def fold_generator_bn(variables: dict) -> list:
    """Fold inference-mode BatchNorm into the conv layers of a
    ``Generator`` variable tree (params [+ batch_stats]).

    Returns ``[(kernel, bias, act), ...]`` in layer order, where
    ``kernel`` is f32 ``(kh, kw, cin, cout)``, ``bias`` f32 ``(cout,)``,
    and the composition ``act(conv(x, kernel) + bias)`` per layer equals
    ``Generator.apply(variables, x, train=False)`` exactly (f32 algebra;
    BN with running stats is the affine
    ``y = (x - mean) * gamma / sqrt(var + eps) + beta``).
    """
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    names = sorted(params.keys(), key=lambda n: int(n.rsplit("_", 1)[1]))
    layers = []
    for i, name in enumerate(names):
        blk = params[name]
        k = jnp.asarray(blk["Conv_0"]["kernel"], jnp.float32)
        b = blk["Conv_0"].get("bias")
        b = (jnp.zeros((k.shape[-1],), jnp.float32) if b is None
             else jnp.asarray(b, jnp.float32))
        if "BatchNorm_0" in blk:
            st = bstats[name]["BatchNorm_0"]
            inv = jnp.asarray(blk["BatchNorm_0"]["scale"], jnp.float32) * \
                lax.rsqrt(jnp.asarray(st["var"], jnp.float32) + _BN_EPS)
            k = k * inv  # broadcasts over the cout axis
            b = (b - jnp.asarray(st["mean"], jnp.float32)) * inv + \
                jnp.asarray(blk["BatchNorm_0"]["bias"], jnp.float32)
        act = "sigmoid" if i == len(names) - 1 else "relu"
        layers.append((k, b, act))
    return layers


def folded_apply(layers: Sequence, x, dtype: Any = jnp.float32,
                 on_input: Callable | None = None) -> jax.Array:
    """Run the folded layers — the quantization-free oracle.

    ``dtype`` sets the compute dtype (bf16 for the half-precision serving
    variant). ``on_input`` is called with each layer's INPUT tensor
    before the conv — the single hook that calibration and any
    intermediate-statistics consumer share, so there is exactly one copy
    of the conv+act layer loop to keep in sync.
    """
    h = jnp.asarray(x, dtype)
    for k, b, act in layers:
        if on_input is not None:
            on_input(h)
        h = lax.conv_general_dilated(h, jnp.asarray(k, dtype), (1, 1),
                                     "SAME", dimension_numbers=_DN)
        h = _act(act)(h + jnp.asarray(b, dtype))
    return h.astype(jnp.float32)


def quantize_weight_int8(k, *, keep_leading: bool = False) -> tuple:
    """Per-out-channel symmetric int8: ``k ~= q * scale`` with
    ``q`` int8 in [-127, 127] and ``scale`` f32 ``(cout,)``.

    ``keep_leading=True`` (stacked expert weights, models/moe.py: (E, ...,
    cout)): scales are per (expert, out-channel) — one expert's magnitude
    never clips another's — stored broadcast-ready as (E, 1, ..., cout)."""
    first = 1 if keep_leading else 0
    amax = jnp.max(jnp.abs(k), axis=tuple(range(first, k.ndim - 1)))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    if keep_leading:
        scale = scale.reshape(
            (k.shape[0],) + (1,) * (k.ndim - 2) + (k.shape[-1],))
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def calibrate_activation_scales(layers: Sequence, calib_x) -> list[float]:
    """Per-tensor absmax of each layer's INPUT on a representative batch,
    collected from the folded f32 forward (host floats, baked as consts).

    Scales are SYMMETRIC (absmax/127) even though every folded-generator
    activation is non-negative (input in [0,1], relu/sigmoid outputs) —
    deliberately: an unsigned/asymmetric scheme would double the code
    density but XLA's int8 conv path needs equal operand dtypes, so a
    zero-point would cost a per-call correction conv. The measured error
    budgets (tests/test_quantize.py) hold with the 7-bit effective range.
    """
    scales = []

    def record(h):
        amax = float(jnp.max(jnp.abs(h)))
        scales.append(max(amax, 1e-8) / 127.0)

    folded_apply(layers, calib_x, on_input=record)
    return scales


_W8_LEAF_NAMES = ("kernel", "W")  # Flax Conv/Dense/ConvTranspose + GAT W
# stacked MoE expert weights (models/moe.py, (E, ..., cout)): quantized
# with per-(expert, out-channel) scales; the router stays f32 (argmax
# routing is numerics-sensitive and tiny)
_W8_EXPERT_LEAF_NAMES = ("w1", "w2")


def _leaf_name(path) -> str:
    last = path[-1]
    return last.key if hasattr(last, "key") else str(last)


def make_w8_apply(apply_fn: Callable, variables: dict) -> tuple[Callable, dict]:
    """Generic weight-only int8 for ANY variable tree (model-agnostic —
    the path for the GAT/UNet families whose graphs have no foldable
    conv+BN chain shape like the DCGAN generator's).

    Every float weight leaf named ``kernel`` (Flax Conv / ConvTranspose /
    Dense) or ``W`` (GAT feature maps, models/gat/{layers,gat3d}.py) with
    ndim >= 2 is stored per-out-channel symmetric int8 and dequantized to
    f32 at run time; stacked MoE expert weights (``moe/{w1,w2}``,
    models/moe.py) get per-(expert, out-channel) scales; everything else
    (biases, BN affine/stats, attention vectors ``a``, learnable
    adjacency ``B``, the MoE router) stays f32 — those are tiny
    and numerics-sensitive. The returned ``fwd(x)`` closes over the int8
    constants, so an exported artifact carries ~4x fewer weight bytes for
    kernel-dominated models (SmaAt-UNet: 4.03M of 4.03M params are
    kernels/biases).

    ``apply_fn(variables, x)`` is the model's inference closure (caller
    binds ``train=False``/mutable flags). Returns ``(fwd, meta)``.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    tagged = []
    n_q = bytes_q = bytes_f32 = 0
    for path, a in leaves:
        a = jnp.asarray(a)
        name = _leaf_name(path)
        in_moe = any(getattr(p, "key", None) == "moe" for p in path)
        is_plain = name in _W8_LEAF_NAMES and a.ndim >= 2
        is_expert = (in_moe and name in _W8_EXPERT_LEAF_NAMES
                     and a.ndim >= 3)
        if ((is_plain or is_expert)
                and jnp.issubdtype(a.dtype, jnp.floating)):
            q, s = quantize_weight_int8(
                jnp.asarray(a, jnp.float32), keep_leading=is_expert)
            tagged.append((q, s))
            n_q += 1
            bytes_q += q.size + s.size * 4
            bytes_f32 += a.size * 4
        else:
            tagged.append((a, None))

    def fwd(x):
        vals = [q.astype(jnp.float32) * s if s is not None else q
                for q, s in tagged]
        return apply_fn(jax.tree_util.tree_unflatten(treedef, vals), x)

    meta = {
        "quantize": "w8",
        "quantized_leaves": n_q,
        "weight_bytes_int8": int(bytes_q),
        "weight_bytes_f32": int(bytes_f32),
    }
    return fwd, meta


def make_quantized_generator(
    variables: dict,
    mode: str = "w8",
    calib_x=None,
    compute_dtype: Any = jnp.float32,
    reference_apply: Callable | None = None,
) -> tuple[Callable, dict]:
    """Build the quantized inference forward for a ``Generator``.

    Returns ``(fwd, meta)``. ``fwd(x) -> y`` is jittable and closes over
    int8 weights (exportable via serve.export — the artifact bakes the
    int8 constants). ``meta`` records the mode and scale statistics.

    ``mode="w8"``: weight-only — int8 kernels dequantized to
    ``compute_dtype`` at run time.
    ``mode="w8a8"``: int8 conv with int32 accumulation; requires
    ``calib_x`` (a representative input batch) for the static per-tensor
    activation scales.
    """
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quantization mode {mode!r}")
    layers = fold_generator_bn(variables)
    if reference_apply is not None:
        # guard the by-convention fold (block-name sort, act-by-position,
        # eps, stride) against model drift: a wrong fold would otherwise
        # ship silently, since every downstream check compares the folded
        # closure against itself
        probe = (jnp.asarray(calib_x[:2], jnp.float32) if calib_x is not None
                 else jnp.full((1, 8, 8, layers[0][0].shape[2]), 0.5,
                               jnp.float32))
        drift = float(jnp.max(jnp.abs(
            folded_apply(layers, probe) - reference_apply(probe))))
        if drift > 1e-3:
            raise ValueError(
                f"BN fold diverges from the reference apply (max err "
                f"{drift:.2e}); the Generator structure no longer matches "
                f"fold_generator_bn's conventions")
    qlayers = [(*quantize_weight_int8(k), b, act) for k, b, act in layers]

    if mode == "w8":
        def fwd(x):
            h = jnp.asarray(x, compute_dtype)
            for q, s, b, act in qlayers:
                w = (q.astype(jnp.float32) * s).astype(compute_dtype)
                h = lax.conv_general_dilated(h, w, (1, 1), "SAME",
                                             dimension_numbers=_DN)
                h = _act(act)(h + b.astype(compute_dtype))
            return h.astype(jnp.float32)

        meta = {"quantize": "w8", "n_layers": len(qlayers)}
        return fwd, meta

    if calib_x is None:
        raise ValueError("w8a8 needs calib_x (a representative batch) for "
                         "static activation scales")
    a_scales = calibrate_activation_scales(layers, calib_x)

    def fwd(x):
        h = jnp.asarray(x, jnp.float32)
        for (q, s_w, b, act), s_a in zip(qlayers, a_scales):
            xi = jnp.clip(jnp.round(h / s_a), -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(
                xi, q, (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            h = _act(act)(y.astype(jnp.float32) * (s_w * s_a) + b)
        return h

    meta = {
        "quantize": "w8a8",
        "n_layers": len(qlayers),
        "activation_scales": [float(s) for s in a_scales],
    }
    return fwd, meta
