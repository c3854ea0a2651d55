"""int8 PTQ serving path (serve/quantize.py).

The reference is pure f32 torch with no quantization or deployment story
(SURVEY.md §2.7); these tests pin the TPU-native PTQ pipeline: exact
inference-BN folding, per-channel int8 weight quantization (w8), full
int8 conv with calibrated activation scales (w8a8), and export of the
quantized forward through the StableHLO serving path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.models.dcgan import Generator
from extended_gan_tpu.serve.quantize import (
    calibrate_activation_scales,
    fold_generator_bn,
    folded_apply,
    make_quantized_generator,
    quantize_weight_int8,
)


def _lively_variables(seed=0):
    """A Generator variable tree with non-degenerate activations.

    Torch-default init on a 5-deep relu chain dies to ~0 activations
    (quantization errors would vacuously vanish); these weights keep
    every layer's pre-activation absmax in ~[0.2, 1.3] (asserted below)
    without the chaotic amplification of wider random weights.
    """
    m = Generator()
    v = jax.device_get(
        m.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 4)),
               train=False))
    rng = np.random.default_rng(seed)

    def randomize(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        a = np.asarray(a, np.float32)
        draw = {
            "kernel": lambda: rng.normal(0, 0.05, a.shape),
            "bias": lambda: rng.normal(0.05, 0.05, a.shape),
            "scale": lambda: rng.uniform(0.8, 1.2, a.shape),
            "mean": lambda: rng.normal(0, 0.05, a.shape),
            "var": lambda: rng.uniform(0.8, 1.2, a.shape),
        }.get(name)
        return jnp.asarray(draw() if draw else a, jnp.float32)

    return m, jax.tree_util.tree_map_with_path(randomize, v)


def _inputs(batch=4, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((batch, 64, 64, 4)), jnp.float32)


@pytest.fixture(scope="module")
def setup():
    model, variables = _lively_variables()
    x = _inputs()
    ref = model.apply(variables, x, train=False)
    return model, variables, x, ref


def test_activations_are_alive(setup):
    # guard against the degenerate all-zeros regime in which every
    # quantization error bound below would pass vacuously
    _, variables, x, ref = setup
    layers = fold_generator_bn(variables)
    h = x
    from jax import lax
    for k, b, act in layers:
        h = lax.conv_general_dilated(
            h, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        assert float(jnp.max(jnp.abs(h))) > 0.1
        h = jax.nn.relu(h) if act == "relu" else jax.nn.sigmoid(h)
    assert float(ref.std()) > 0.01


def test_bn_folding_matches_model(setup):
    model, variables, x, ref = setup
    folded = folded_apply(fold_generator_bn(variables), x)
    # algebraically exact; tolerance is f32 rounding through 5 layers
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               atol=1e-3)


def test_fold_handles_missing_batchnorm_layer(setup):
    _, variables, _, _ = setup
    layers = fold_generator_bn(variables)
    assert len(layers) == 5
    # final layer (no BN) keeps the raw conv weights and sigmoid act
    assert layers[-1][2] == "sigmoid"
    assert all(act == "relu" for _, _, act in layers[:-1])


def test_weight_quantization_roundtrip_error():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(0, 0.1, (4, 4, 16, 8)), jnp.float32)
    q, scale = quantize_weight_int8(k)
    assert q.dtype == jnp.int8 and scale.shape == (8,)
    err = jnp.max(jnp.abs(q.astype(jnp.float32) * scale - k))
    # symmetric per-channel: error <= scale/2 per channel
    assert float(err) <= float(jnp.max(scale)) / 2 + 1e-7


def test_weight_quantization_zero_channel_safe():
    k = jnp.zeros((4, 4, 3, 2), jnp.float32)
    q, scale = quantize_weight_int8(k)
    assert not np.any(np.isnan(np.asarray(scale)))
    np.testing.assert_array_equal(np.asarray(q), 0)


def test_w8_weight_only_close_to_f32(setup):
    _, variables, x, ref = setup
    fwd, meta = make_quantized_generator(variables, mode="w8")
    y = jax.jit(fwd)(x)
    assert meta["quantize"] == "w8"
    assert float(jnp.max(jnp.abs(y - ref))) < 2e-3


def test_w8a8_int8_conv_bounded(setup):
    _, variables, x, ref = setup
    fwd, meta = make_quantized_generator(variables, mode="w8a8", calib_x=x)
    y = jax.jit(fwd)(x)
    assert meta["quantize"] == "w8a8"
    assert len(meta["activation_scales"]) == 5
    assert float(jnp.max(jnp.abs(y - ref))) < 5e-3


def test_w8a8_generalizes_beyond_calibration_batch(setup):
    # calibrate on one batch, evaluate on another from the same domain
    model, variables, x, _ = setup
    fwd, _ = make_quantized_generator(variables, mode="w8a8", calib_x=x)
    x2 = _inputs(batch=3, seed=7)
    ref2 = model.apply(variables, x2, train=False)
    assert float(jnp.max(jnp.abs(jax.jit(fwd)(x2) - ref2))) < 5e-3


def test_w8a8_requires_calibration(setup):
    _, variables, _, _ = setup
    with pytest.raises(ValueError, match="calib_x"):
        make_quantized_generator(variables, mode="w8a8")


def test_unknown_mode_rejected(setup):
    _, variables, _, _ = setup
    with pytest.raises(ValueError, match="mode"):
        make_quantized_generator(variables, mode="int4")


def test_calibration_scales_cover_inputs(setup):
    _, variables, x, _ = setup
    scales = calibrate_activation_scales(fold_generator_bn(variables), x)
    # first scale covers the input batch's own absmax exactly
    assert scales[0] * 127.0 == pytest.approx(float(jnp.max(jnp.abs(x))),
                                              rel=1e-6)
    assert all(s > 0 for s in scales)


def test_quantized_export_roundtrip(tmp_path, setup):
    """The quantized forward exports/serves through the StableHLO path
    and the artifact is SMALLER than the f32 export of the same model."""
    from extended_gan_tpu.serve import (
        export_forward,
        save_exported,
        serving_fn,
    )

    model, variables, x, _ = setup
    qfwd, meta = make_quantized_generator(variables, mode="w8")

    qpath = os.path.join(tmp_path, "g_w8.stablehlo")
    qinfo = save_exported(export_forward(qfwd, x), qpath, metadata=meta)
    assert qinfo["quantize"] == "w8"

    def f32_fwd(xx):
        return model.apply(variables, xx, train=False)

    fpath = os.path.join(tmp_path, "g_f32.stablehlo")
    finfo = save_exported(export_forward(f32_fwd, x), fpath)

    serve = serving_fn(qpath)
    x2 = _inputs(batch=2, seed=9)
    np.testing.assert_allclose(np.asarray(serve(x2)),
                               np.asarray(jax.jit(qfwd)(x2)), atol=1e-6)
    assert qinfo["nbytes"] < finfo["nbytes"], (
        f"w8 artifact ({qinfo['nbytes']}B) not smaller than f32 "
        f"({finfo['nbytes']}B)")


# ---- generic weight-only quantization (make_w8_apply) ----


def _tiny_gat():
    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    model = build_model(
        "temporal", image_width=8, image_height=8, n_vertices=6,
        mapping_type="conv", time_steps=4,
    )
    state = create_net_state(
        model, adam(1e-3), KeySeq(7).next(), jnp.zeros((2, 8, 8, 4, 6)))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model, variables


def test_w8_apply_gat_numerics_and_byte_cut():
    from extended_gan_tpu.serve.quantize import make_w8_apply

    model, variables = _tiny_gat()
    x = jnp.asarray(np.random.default_rng(2).random((2, 8, 8, 4, 6)),
                    jnp.float32)
    ref = model.apply(variables, x, train=False)

    def apply_fn(v, xx):
        return model.apply(v, xx, train=False)

    fwd, meta = make_w8_apply(apply_fn, variables)
    y = jax.jit(fwd)(x)
    assert meta["quantize"] == "w8"
    assert meta["quantized_leaves"] > 0
    # quantized leaves carry ~4x fewer bytes than their f32 originals
    assert meta["weight_bytes_int8"] < meta["weight_bytes_f32"] / 3
    err = float(jnp.max(jnp.abs(y - ref)))
    assert err < 5e-2, f"w8 gat output err {err}"
    assert err > 0  # something actually got quantized


def test_w8_apply_skips_sensitive_leaves():
    """Attention vectors `a`, adjacency `B`, biases, and BN leaves stay
    f32 — only kernel/W weight matrices quantize."""
    from extended_gan_tpu.serve.quantize import _W8_LEAF_NAMES, make_w8_apply

    model, variables = _tiny_gat()

    names = []

    def collect(path, a):
        last = path[-1]
        name = last.key if hasattr(last, "key") else str(last)
        if (name in _W8_LEAF_NAMES and hasattr(a, "ndim") and a.ndim >= 2):
            names.append(name)
        return a

    jax.tree_util.tree_map_with_path(collect, variables)
    _, meta = make_w8_apply(lambda v, x: model.apply(v, x, train=False),
                            variables)
    assert meta["quantized_leaves"] == len(names)
    # the GAT family really does carry W leaves (not just convs)
    assert "W" in names or "kernel" in names


def test_w8_apply_identity_when_nothing_quantizable():
    from extended_gan_tpu.serve.quantize import make_w8_apply

    variables = {"params": {"bias": jnp.ones((4,), jnp.float32)}}

    def apply_fn(v, x):
        return x + v["params"]["bias"]

    fwd, meta = make_w8_apply(apply_fn, variables)
    assert meta["quantized_leaves"] == 0
    x = jnp.zeros((2, 4), jnp.float32)
    np.testing.assert_array_equal(np.asarray(fwd(x)),
                                  np.asarray(x + 1.0))


def test_fold_validation_against_reference_apply(setup):
    """make_quantized_generator(reference_apply=...) accepts the true
    model and rejects a drifted one."""
    model, variables, x, _ = setup

    def good(xx):
        return model.apply(variables, xx, train=False)

    fwd, _ = make_quantized_generator(variables, mode="w8", calib_x=x,
                                      reference_apply=good)
    assert fwd is not None

    def drifted(xx):
        return good(xx) + 0.01

    with pytest.raises(ValueError, match="fold diverges"):
        make_quantized_generator(variables, mode="w8", calib_x=x,
                                 reference_apply=drifted)


def test_folded_apply_bf16_close_to_f32(setup):
    """The dtype hook: bf16 folded forward tracks f32 within half-
    precision rounding (the probe's bf16 serving variant)."""
    from extended_gan_tpu.serve.quantize import fold_generator_bn

    _, variables, x, ref = setup
    layers = fold_generator_bn(variables)
    y16 = folded_apply(layers, x, dtype=jnp.bfloat16)
    assert y16.dtype == jnp.float32  # cast back at the boundary
    assert float(jnp.max(jnp.abs(y16 - ref))) < 3e-2


def test_calibration_via_on_input_hook_matches_layer_count(setup):
    _, variables, x, _ = setup
    layers = fold_generator_bn(variables)
    seen = []
    folded_apply(layers, x, on_input=lambda h: seen.append(h.shape))
    assert len(seen) == len(layers)
    assert seen[0] == x.shape
