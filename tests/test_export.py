"""AOT serving export: jax.export round-trip and the export CLI.

The artifact must (a) reproduce the live model bit-for-bit, (b) serve
ANY batch size from one export (symbolic batch axis), and (c) execute
without the model's Python class in scope.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_gat_forward():
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    model = build_model(
        "temporal", image_width=8, image_height=8, n_vertices=6,
        mapping_type="conv", time_steps=4,
    )
    state = create_net_state(
        model, adam(1e-3), KeySeq(0).next(), jnp.zeros((2, 8, 8, 4, 6))
    )
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def fwd(x):
        return model.apply(variables, x, train=False)

    return fwd


@pytest.mark.slow
def test_export_roundtrip_symbolic_batch(tmp_path):
    from extended_gan_tpu.serve import (
        export_forward,
        save_exported,
        serving_fn,
    )

    fwd = _tiny_gat_forward()
    example = np.zeros((1, 8, 8, 4, 6), np.float32)
    exported = export_forward(fwd, example)
    path = str(tmp_path / "model.stablehlo")
    meta = save_exported(exported, path, metadata={"model_type": "temporal"})
    assert os.path.exists(path)
    assert meta["model_type"] == "temporal"
    sidecar = json.load(open(path + ".json"))
    assert sidecar["format_version"] == 1
    assert sidecar["nbytes"] > 0

    serve = serving_fn(path)
    rng = np.random.default_rng(7)
    # one artifact, multiple batch sizes — the symbolic-dim contract
    for b in (1, 3, 8):
        x = rng.random((b, 8, 8, 4, 6), dtype=np.float32)
        got = np.asarray(serve(x))
        want = np.asarray(fwd(x))
        assert got.shape == (b, 8, 8, 4, 6)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_exported_artifact_runs_without_model_code(tmp_path):
    """Deserialize + execute in a subprocess that never imports the
    models package — the no-Python-source serving contract."""
    from extended_gan_tpu.serve import export_forward, save_exported

    fwd = _tiny_gat_forward()
    example = np.zeros((1, 8, 8, 4, 6), np.float32)
    path = str(tmp_path / "model.stablehlo")
    save_exported(export_forward(fwd, example), path)
    x = np.random.default_rng(3).random((4, 8, 8, 4, 6), dtype=np.float32)
    np.save(tmp_path / "x.npy", x)

    code = (
        "import sys, numpy as np, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax import export\n"
        "ex = export.deserialize(open(sys.argv[1], 'rb').read())\n"
        "y = jax.jit(ex.call)(np.load(sys.argv[2]))\n"
        "np.save(sys.argv[3], np.asarray(y))\n"
        "banned = [m for m in sys.modules if 'extended_gan_tpu' in m]\n"
        "assert not banned, banned\n"
    )
    out_npy = str(tmp_path / "y.npy")
    subprocess.run(
        [sys.executable, "-c", code, path, str(tmp_path / "x.npy"), out_npy],
        check=True, cwd=str(tmp_path),
    )
    np.testing.assert_allclose(np.load(out_npy), np.asarray(fwd(x)),
                               atol=1e-6)


@pytest.mark.slow
def test_export_cli_gat(tmp_path):
    """Experiment dir -> artifact via the CLI, --check verifying numerics."""
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.checkpoint import save_model
    from extended_gan_tpu.train.optim import adam
    from extended_gan_tpu.train.state import create_net_state

    exp = tmp_path / "exp_export"
    os.makedirs(exp)
    (exp / "config.py").write_text(
        'MODEL_TYPE = "temporal"\n'
        'MAPPING_TYPE = "conv"\n'
        'DATASET = "synthetic"\n'
        "DOWNSAMPLE_SIZE = (8, 8)\n"
    )
    model = build_model(
        "temporal", image_width=8, image_height=8, n_vertices=6,
        mapping_type="conv", time_steps=4,
    )
    state = create_net_state(
        model, adam(1e-3), KeySeq(369).next(), jnp.zeros((2, 8, 8, 4, 6))
    )
    save_model(str(exp / "model.msgpack"), state.params, state.batch_stats)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import export_model
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "artifact.stablehlo")
    export_model.main([str(exp), "--out", out, "--check"])
    assert os.path.exists(out)
    assert json.load(open(out + ".json"))["model_type"] == "temporal"

    # --quantize w8 on the gat family: generic weight-only int8
    # (serve/quantize.py::make_w8_apply); w8a8 is rejected (no foldable
    # conv+BN chain)
    qout = str(tmp_path / "artifact_w8.stablehlo")
    export_model.main([str(exp), "--out", qout, "--quantize", "w8",
                       "--check"])
    qmeta = json.load(open(qout + ".json"))
    assert qmeta["quantize"] == "w8" and qmeta["quantized_leaves"] > 0
    assert qmeta["nbytes"] < json.load(open(out + ".json"))["nbytes"]
    from extended_gan_tpu.serve import serving_fn
    x = np.random.default_rng(3).random((2, 8, 8, 4, 6), np.float32)
    err = float(np.max(np.abs(np.asarray(serving_fn(qout)(x)) -
                              np.asarray(serving_fn(out)(x)))))
    assert err < 5e-2, f"w8 gat artifact err {err}"
    with pytest.raises(SystemExit, match="w8a8"):
        export_model.main([str(exp), "--out", qout, "--quantize", "w8a8"])


def test_http_server_predict_roundtrip(tmp_path):
    """Export -> serve over HTTP -> predict matches the live model; odd
    batch sizes exercise the pad-to-power-of-two bucketing."""
    import io
    import threading
    import urllib.request

    from extended_gan_tpu.serve import export_forward, make_server, \
        save_exported

    fwd = _tiny_gat_forward()
    example = np.zeros((1, 8, 8, 4, 6), np.float32)
    path = str(tmp_path / "model.stablehlo")
    save_exported(export_forward(fwd, example), path)

    server = make_server(path, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as r:
            health = json.loads(r.read())
        assert health["platforms"]
        assert "float32[b,8,8,4,6]" in health["inputs"][0]

        rng = np.random.default_rng(11)
        for b in (1, 3, 5):  # 3 and 5 pad to 4 and 8 internally
            x = rng.random((b, 8, 8, 4, 6), dtype=np.float32)
            buf = io.BytesIO()
            np.save(buf, x)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict",
                data=buf.getvalue(), method="POST",
            )
            with urllib.request.urlopen(req) as r:
                y = np.load(io.BytesIO(r.read()))
            assert y.shape == (b, 8, 8, 4, 6)
            np.testing.assert_allclose(y, np.asarray(fwd(x)), atol=1e-6)

        # malformed body -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"junk", method="POST"
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as r:
            assert json.loads(r.read())["requests_served"] == 3
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_export_cli_dcgan_generator(tmp_path):
    """Orbax GAN checkpoint -> generator artifact via --workload dcgan."""
    from extended_gan_tpu.train.dcgan_driver import train

    out = str(tmp_path / "run")
    train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, seed=5, out_dir=out,
        params={"imsize": 64, "ngf": 8, "ndf": 8, "save_epoch": 1},
    )

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import export_model
    finally:
        sys.path.pop(0)
    artifact = str(tmp_path / "g.stablehlo")
    export_model.main([
        out, "--workload", "dcgan", "--ndf", "8", "--out", artifact,
        "--check",
    ])
    assert os.path.exists(artifact)
    meta = json.load(open(artifact + ".json"))
    assert meta["model_type"] == "dcgan_generator"
    assert meta["epoch"] == 1
    assert meta["layout"] == "default"

    # --packed-g: the SAME checkpoint exported in 2x2 space-to-depth
    # compute layout (the generator-only-serving layout, BENCH_NOTES
    # "packed_g ablation"). Same function: the two artifacts must agree
    # on identical inputs up to float summation order.
    packed = str(tmp_path / "g_packed.stablehlo")
    export_model.main([
        out, "--workload", "dcgan", "--ndf", "8", "--out", packed,
        "--packed-g", "--check",
    ])
    assert json.load(open(packed + ".json"))["layout"] == "packed2"
    import numpy as np

    from extended_gan_tpu.serve import serving_fn
    x = np.random.default_rng(7).random((3, 64, 64, 4), np.float32)
    y_default = np.asarray(serving_fn(artifact)(x))
    y_packed = np.asarray(serving_fn(packed)(x))
    np.testing.assert_allclose(y_packed, y_default, rtol=1e-4, atol=1e-5)

    # --quantize: int8 PTQ of the same checkpoint (serve/quantize.py).
    # w8 must track the f32 artifact tightly; w8a8 within the calibrated
    # int8 budget; the w8 artifact must be smaller than the f32 one.
    f32_nbytes = meta["nbytes"]
    budgets = {"w8": 5e-3, "w8a8": 3e-2}
    for mode, budget in budgets.items():
        qpath = str(tmp_path / f"g_{mode}.stablehlo")
        export_model.main([
            out, "--workload", "dcgan", "--ndf", "8", "--out", qpath,
            "--quantize", mode, "--check",
        ])
        qmeta = json.load(open(qpath + ".json"))
        assert qmeta["quantize"] == mode
        y_q = np.asarray(serving_fn(qpath)(x))
        err = float(np.max(np.abs(y_q - y_default)))
        assert err < budget, f"{mode} artifact err {err} > {budget}"
        if mode == "w8":
            assert qmeta["nbytes"] < f32_nbytes

    # --rollout: K-step autoregressive horizon in one artifact
    # (serve/rollout.py); window 0 must equal the one-step artifact and
    # window k must equal the iterated one-step prediction.
    rpath = str(tmp_path / "g_roll.stablehlo")
    export_model.main([
        out, "--workload", "dcgan", "--ndf", "8", "--out", rpath,
        "--rollout", "3", "--check",
    ])
    rmeta = json.load(open(rpath + ".json"))
    assert rmeta["rollout"] == 3
    y_roll = np.asarray(serving_fn(rpath)(x))
    assert y_roll.shape == (3, 3, 64, 64, 4)
    one_step = serving_fn(artifact)
    h = x
    for k in range(3):
        h = np.asarray(one_step(h))
        np.testing.assert_allclose(y_roll[:, k], h, atol=1e-5)


@pytest.mark.slow
def test_export_cli_cyclegan_generator(tmp_path):
    """Orbax CycleGAN checkpoint -> G_xy artifact via --workload cyclegan
    (round-2 VERDICT item 8: third export mode with round-trip check)."""
    from extended_gan_tpu.train.cyclegan_driver import train

    out = str(tmp_path / "run")
    train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        imsize=64, ndf=8, synthetic=True, seed=5, out_dir=out,
        save_epoch=1,
    )

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import export_model
    finally:
        sys.path.pop(0)
    for direction in ("xy", "yx"):
        artifact = str(tmp_path / f"g_{direction}.stablehlo")
        export_model.main([
            out, "--workload", "cyclegan", "--direction", direction,
            "--ndf", "8", "--out", artifact, "--check",
        ])
        assert os.path.exists(artifact)
        meta = json.load(open(artifact + ".json"))
        assert meta["model_type"] == f"cyclegan_generator_{direction}"
        assert meta["epoch"] == 1
