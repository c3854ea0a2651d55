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

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.W = nn.Parameter(
                torch.randn(n_features, n_features, generator=g))
            self.a = nn.Parameter(
                torch.randn(2 * n_features, 1, generator=g))
            self.B = nn.Parameter(
                torch.randn(n_vertices, n_vertices, generator=g))

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


def test_import_rejects_unknown_family(tmp_path):
    """GAT3D families aren't importable (no authoritative torch key schema
    in the reference tree) — the error says so instead of guessing."""
    mod = _importer()
    with pytest.raises(SystemExit, match="not importable"):
        mod.main(["--model-type", "temporal", "--width", "4", "--height",
                  "4", "--pt", "x.pt"])


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
