"""Autoregressive rollout serving (serve/rollout.py).

The reference predicts exactly one window ahead (4 context frames -> 4
predicted frames, /root/reference/dcgan/train.py:122,
/root/reference/convolutional_gat/train.py:191-205); the rollout wrapper
is the TPU-native multi-horizon extension: K windows from one lax.scan
program. These tests pin the composition semantics (rollout == iterated
forward, exactly), the layout options, the export round-trip, and the
PTQ composition.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.serve.rollout import make_rollout


def _fwd(x):
    # shape-preserving nonlinear map with enough structure to catch
    # ordering bugs (not symmetric in the frame axis)
    w = jnp.arange(1, x.shape[-1] + 1, dtype=jnp.float32)
    return jax.nn.sigmoid(jnp.roll(x, 1, axis=-1) * w - 0.3)


def _x(batch=3, seed=0, shape=(5, 5, 4)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((batch, *shape)), jnp.float32)


def test_rollout_one_step_equals_forward():
    x = _x()
    y = make_rollout(_fwd, 1)(x)
    assert y.shape == (x.shape[0], 1, *x.shape[1:])
    # scan-body vs standalone compilations may differ by 1 ulp
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(_fwd(x)),
                               atol=1e-6)


def test_rollout_equals_iterated_forward_exactly():
    x = _x()
    y = jax.jit(make_rollout(_fwd, 4))(x)
    h = x
    for k in range(4):
        h = _fwd(h)
        np.testing.assert_allclose(np.asarray(y[:, k]), np.asarray(h),
                                   atol=1e-6)
    assert y.shape == (x.shape[0], 4, *x.shape[1:])


def test_rollout_concat_axis_film_strip():
    # DCGAN frames-as-channels layout: (B, H, W, 4) -> (B, H, W, 4*K)
    x = _x()
    stacked = make_rollout(_fwd, 3)(x)
    strip = make_rollout(_fwd, 3, concat_axis=-1)(x)
    assert strip.shape == (3, 5, 5, 12)
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(strip[..., 4 * k: 4 * (k + 1)]),
            np.asarray(stacked[:, k]))


def test_rollout_concat_axis_gat_layout():
    # GAT layout (B, H, W, T, V): concat along T (axis -2)
    def fwd(x):
        return jnp.tanh(x + 0.1)

    x = jnp.asarray(np.random.default_rng(1).random((2, 4, 4, 4, 6)),
                    jnp.float32)
    strip = make_rollout(fwd, 2, concat_axis=-2)(x)
    assert strip.shape == (2, 4, 4, 8, 6)


def test_rollout_rejects_batch_concat_axis():
    with pytest.raises(ValueError, match="batch axis"):
        make_rollout(_fwd, 2, concat_axis=0)(_x())


def test_rollout_rejects_non_shape_preserving():
    def bad(x):
        return x[..., :2]

    with pytest.raises(ValueError, match="shape-preserving"):
        make_rollout(bad, 2)(_x())


def test_rollout_rejects_zero_steps():
    with pytest.raises(ValueError, match=">= 1"):
        make_rollout(_fwd, 0)


def test_rollout_export_roundtrip(tmp_path):
    """The rolled forward exports to a StableHLO artifact with a symbolic
    batch axis and serves the whole horizon in one call."""
    from extended_gan_tpu.serve import (
        export_forward,
        save_exported,
        serving_fn,
    )

    rolled = make_rollout(_fwd, 3)
    x = _x(batch=2)
    path = os.path.join(tmp_path, "rollout.stablehlo")
    info = save_exported(export_forward(rolled, x), path,
                         metadata={"rollout": 3})
    assert info["rollout"] == 3

    serve = serving_fn(path)
    x2 = _x(batch=4, seed=9)  # different batch: symbolic axis exercised
    np.testing.assert_allclose(np.asarray(serve(x2)),
                               np.asarray(rolled(x2)), atol=1e-6)


def test_rollout_composes_with_quantized_generator():
    """PTQ x rollout: the quantized DCGAN generator rolls out and the
    horizon error stays within the per-window budget compounded."""
    from tests.test_quantize import _inputs, _lively_variables

    from extended_gan_tpu.serve.quantize import make_quantized_generator

    model, variables = _lively_variables()
    x = _inputs(batch=2)
    qfwd, _ = make_quantized_generator(variables, mode="w8")
    K = 3
    y_q = jax.jit(make_rollout(qfwd, K))(x)
    h = x
    for k in range(K):
        h = model.apply(variables, h, train=False)
        err = float(jnp.max(jnp.abs(y_q[:, k] - h)))
        assert err < 2e-3 * (k + 1), f"window {k}: err {err}"


def test_rollout_artifact_serves_over_http(tmp_path):
    """The HTTP server is artifact-shape-agnostic: a rollout artifact
    serves the (B, K, ...) horizon through /predict with batch
    bucketing (pad rows sliced off the leading axis only)."""
    import io
    import threading
    import urllib.request

    from extended_gan_tpu.serve import (
        export_forward,
        make_server,
        save_exported,
    )

    rolled = make_rollout(_fwd, 2)
    path = os.path.join(tmp_path, "rollout.stablehlo")
    save_exported(export_forward(rolled, _x(batch=2)), path)

    server = make_server(path, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        x = np.asarray(_x(batch=3, seed=4))  # pads to 4, slices back to 3
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req) as r:
            y = np.load(io.BytesIO(r.read()))
        assert y.shape == (3, 2, 5, 5, 4)
        np.testing.assert_allclose(y, np.asarray(rolled(jnp.asarray(x))),
                                   atol=1e-6)
    finally:
        server.shutdown()
        server.server_close()


def test_rollout_final_only_equals_last_window():
    x = _x()
    full = make_rollout(_fwd, 4)(x)
    final = jax.jit(make_rollout(_fwd, 4, final_only=True))(x)
    assert final.shape == x.shape
    np.testing.assert_allclose(np.asarray(final), np.asarray(full[:, -1]),
                               atol=1e-6)


def test_rollout_final_only_rejects_concat_axis():
    with pytest.raises(ValueError, match="concat_axis"):
        make_rollout(_fwd, 2, concat_axis=-1, final_only=True)


def test_rollout_concat_axis_out_of_range():
    with pytest.raises(ValueError, match="out of range"):
        make_rollout(_fwd, 2, concat_axis=5)(_x())
    with pytest.raises(ValueError, match="out of range"):
        make_rollout(_fwd, 2, concat_axis=-5)(_x())
