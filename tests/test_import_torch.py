"""Torch-checkpoint importer (scripts/import_torch_checkpoint.py).

The reference saves its best conv-GAT model as a torch state_dict
(`t.save(model.state_dict(), .../model.pt)`, reference
convolutional_gat/train.py:155). These tests build a torch module with
EXACTLY the reference BaselineModel's state_dict key schema
(`{hidden,output}_layer.attention_{i}.{W,a,B}`, reference
baseline_model.py:236-270), save it through real torch serialization,
and prove the importer lands every tensor on the right flax leaf.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _torch_baseline(n_features, n_vertices, seed=0):
    """Reference-shaped BaselineModel skeleton: the same module names and
    parameter shapes, so state_dict() keys match the reference exactly."""
    from torch import nn

    g = torch.Generator().manual_seed(seed)

    # xavier-ish scale keeps activations in range so the semantic-parity
    # test exercises unsaturated tanh/softmax, not their flat regions
    s = n_features ** -0.5

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.W = nn.Parameter(
                torch.randn(n_features, n_features, generator=g) * s)
            self.a = nn.Parameter(
                torch.randn(2 * n_features, 1, generator=g) * s)
            self.B = nn.Parameter(
                torch.randn(n_vertices, n_vertices, generator=g).abs() * 0.1)

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.add_module("attention_0", Layer())

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.hidden_layer = Head()
            self.output_layer = Head()

    return Model()


def _importer():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import import_torch_checkpoint
    finally:
        sys.path.pop(0)
    return import_torch_checkpoint


def test_import_baseline_roundtrip(tmp_path):
    """model.pt -> model.msgpack: every leaf lands, values exact, and the
    imported model runs through the same load_model path the drivers use."""
    w = h = 4
    tsteps, v = 4, 6
    tm = _torch_baseline(tsteps * w * h, v, seed=3)
    pt = str(tmp_path / "model.pt")
    torch.save(tm.state_dict(), pt)

    mod = _importer()
    out = str(tmp_path / "model.msgpack")
    mod.main(["--model-type", "baseline", "--width", str(w), "--height",
              str(h), "--vertices", str(v), "--pt", pt, "--out", out,
              "--check"])

    import jax
    import jax.numpy as jnp

    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.checkpoint import load_model

    model = build_model("baseline", image_width=w, image_height=h,
                        n_vertices=v, mapping_type="linear",
                        time_steps=tsteps)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, w, h, tsteps, v)), train=False)
    params, _ = load_model(out, template["params"])
    sd = tm.state_dict()
    for layer in ("hidden_layer", "output_layer"):
        for name in ("W", "a", "B"):
            np.testing.assert_array_equal(
                np.asarray(params[layer]["attention_0"][name]),
                sd[f"{layer}.attention_0.{name}"].numpy(),
                err_msg=f"{layer}.attention_0.{name}")


def test_import_via_experiment_config(tmp_path):
    """Reference-style legacy config (MODEL = BaselineModel2D) resolves
    the family; model.pt next to it imports to model.msgpack in place."""
    w = h = 4
    v = 6
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.py").write_text(
        "import torch\n"
        "import torch.nn as nn\n"
        "from convolutional_gat.baseline_model import BaselineModel2D\n"
        "MODEL = BaselineModel2D\n"
        "MAPPING_TYPE = \"linear\"\n"
        "DATASET = \"kmni\"\n"
        "CRITERION = nn.MSELoss()\n"
        "OPTIMIZER = torch.optim.Adam\n"
        f"DOWNSAMPLE_SIZE = ({w}, {h})\n"
    )
    # BaselineModel2D: features per GAT layer = time_steps (4), not T*H*W
    tm = _torch_baseline(4, v, seed=5)
    torch.save(tm.state_dict(), str(exp / "model.pt"))

    mod = _importer()
    out = mod.main([str(exp), "--check"])
    assert out == str(exp / "model.msgpack")
    assert os.path.exists(out)


def _naive_gat_layer(h, W, a, B, alpha=0.2):
    """The reference GraphAttentionLayer math, naive numpy (the same
    oracle test_torch_parity.py proves our layer against)."""
    n_, v_, _ = h.shape

    def leaky(x):
        return np.where(x > 0, x, alpha * x)

    def softmax(x):
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    Wh = h @ W
    e = np.zeros((n_, v_, v_), np.float32)
    for nn_ in range(n_):
        for i in range(v_):
            for j in range(v_):
                e[nn_, i, j] = leaky(
                    np.concatenate([Wh[nn_, i], Wh[nn_, j]]) @ a[:, 0])
    att = softmax(e)
    adj = B + np.eye(v_, dtype=np.float32)
    adj = (adj - adj.min()) / (adj.max() - adj.min())
    d = adj.sum(axis=1)
    adj_n = adj / np.sqrt(np.outer(d, d))
    att = np.einsum("uv,nvw->nuw", adj_n, att)
    hp = np.einsum("nuv,nve->nue", att, Wh)
    return np.where(hp > 0, hp, np.expm1(hp))


def test_imported_weights_semantic_parity(tmp_path):
    """The decisive migration property: a model built from IMPORTED torch
    weights predicts exactly what the reference math computes with those
    same tensors (BaselineModel: two GAT layers + row-major reshape +
    tanh, reference baseline_model.py:236-270)."""
    w = h = 3
    tsteps, v = 4, 5
    nf = tsteps * w * h
    tm = _torch_baseline(nf, v, seed=11)
    pt = str(tmp_path / "model.pt")
    torch.save(tm.state_dict(), pt)

    mod = _importer()
    out = str(tmp_path / "model.msgpack")
    mod.main(["--model-type", "baseline", "--width", str(w), "--height",
              str(h), "--vertices", str(v), "--pt", pt, "--out", out])

    import jax
    import jax.numpy as jnp

    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.checkpoint import load_model

    model = build_model("baseline", image_width=w, image_height=h,
                        n_vertices=v, mapping_type="linear",
                        time_steps=tsteps)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, w, h, tsteps, v)), train=False)
    params, _ = load_model(out, template["params"])

    x = np.random.default_rng(2).random(
        (2, w, h, tsteps, v), np.float32) * 2 - 1
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 train=False))

    sd = {k: t_.numpy() for k, t_ in tm.state_dict().items()}
    hseq = x.reshape(2, w * h * tsteps, v).transpose(0, 2, 1)  # (B, V, F)
    for layer in ("hidden_layer", "output_layer"):
        hseq = _naive_gat_layer(
            hseq,
            sd[f"{layer}.attention_0.W"],
            sd[f"{layer}.attention_0.a"],
            sd[f"{layer}.attention_0.B"],
        )
    want = np.tanh(hseq.reshape(2, w, h, tsteps, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_imported_checkpoint_drives_compare_models(tmp_path):
    """The migration path end-to-end: a reference-style model.pt imported
    into an experiment dir is directly evaluable by compare_models — no
    retraining step in between (docs/MIGRATION.md 'Trained checkpoints')."""
    base = tmp_path / "experiments"
    d = base / "migrated_baseline"
    os.makedirs(d)
    (d / "config.py").write_text(
        "import torch\n"
        "import torch.nn as nn\n"
        "from convolutional_gat.baseline_model import BaselineModel\n"
        "MODEL = BaselineModel\n"
        'MAPPING_TYPE = "linear"\n'
        'DATASET = "synthetic"\n'
        'PREPROCESSED_FOLDER = ""\n'
        "EPOCHS = 1\n"
        "TRAIN_BATCH_SIZE = 8\n"
        "TEST_BATCH_SIZE = 8\n"
        "LEARNING_RATE = 0.001\n"
        "CRITERION = nn.MSELoss()\n"
        "OPTIMIZER = torch.optim.Adam\n"
        "DOWNSAMPLE_SIZE = (16, 16)\n"
    )
    tm = _torch_baseline(4 * 16 * 16, 6, seed=9)
    torch.save(tm.state_dict(), str(d / "model.pt"))

    mod = _importer()
    out = mod.main([str(d)])
    assert out == str(d / "model.msgpack")

    import json

    from convolutional_gat.compare_models.__main__ import compare_models

    res = tmp_path / "results"
    compare_models(
        str(base),
        ["migrated_baseline"],
        out_path=str(res),
        downsample_size=(16, 16),
        preprocessed_folder="",
        dataset="synthetic",
    )
    results = json.load(open(res / "results.json"))
    metrics = results["migrated_baseline"]
    assert np.isfinite(metrics["val_loss"])
    assert metrics["n_parameters"] == sum(
        p.numel() for p in tm.parameters())


def test_import_rejects_unknown_family(tmp_path):
    """GAT3D families aren't importable (no authoritative torch key schema
    in the reference tree) — the error says so instead of guessing."""
    mod = _importer()
    with pytest.raises(SystemExit, match="not importable"):
        mod.main(["--model-type", "temporal", "--width", "4", "--height",
                  "4", "--pt", "x.pt"])


def test_import_rejects_partial_state_dict(tmp_path):
    """A state_dict missing tensors fails loudly, naming the uncovered
    params — never a silently half-initialized model."""
    tm = _torch_baseline(4 * 4 * 4, 6, seed=2)
    sd = tm.state_dict()
    sd.pop("output_layer.attention_0.B")
    pt = str(tmp_path / "model.pt")
    torch.save(sd, pt)
    mod = _importer()
    with pytest.raises(SystemExit, match="missing params.*output_layer"):
        mod.main(["--model-type", "baseline", "--width", "4", "--height",
                  "4", "--vertices", "6", "--pt", pt,
                  "--out", str(tmp_path / "m.msgpack")])


def test_import_rejects_shape_mismatch(tmp_path):
    """Wrong geometry fails loudly with the offending key, not silently."""
    tm = _torch_baseline(4 * 4 * 4, 6, seed=1)
    pt = str(tmp_path / "model.pt")
    torch.save(tm.state_dict(), pt)
    mod = _importer()
    with pytest.raises(SystemExit, match="shape"):
        mod.main(["--model-type", "baseline", "--width", "5", "--height",
                  "5", "--vertices", "6", "--pt", pt,
                  "--out", str(tmp_path / "m.msgpack")])
