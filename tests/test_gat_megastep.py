"""conv-GAT megastep (K steps scanned into one XLA program) == K
sequential single steps fed the same rng sequence (mirrors
tests/test_megastep.py for the GAN trainers; see BENCH_NOTES round 3 for
why the megastep matters: per-PROGRAM dispatch overhead is paid once per
K steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.models.gat.gat3d import Model
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.gat_trainer import (
    make_gat_megastep,
    make_gat_train_step,
)
from extended_gan_tpu.train.optim import make_optimizer
from extended_gan_tpu.train.state import create_net_state

K, B, HW = 3, 8, 16


def _data(seed=5):
    rng = np.random.RandomState(seed)
    xs = rng.rand(K, B, HW, HW, 4, 6).astype(np.float32)
    ys = rng.rand(K, B, HW, HW, 4, 6).astype(np.float32)
    masks = np.ones((K, B), np.float32)
    rngs = jax.random.split(jax.random.PRNGKey(11), K)
    return xs, ys, masks, rngs


def _build(optimizer="sgd", lr=1e-3):
    model = Model(image_width=HW, image_height=HW, n_vertices=6,
                  attention_type="temporal", mapping_type="conv")
    tx = make_optimizer(optimizer, lr)
    state = create_net_state(model, tx, jax.random.PRNGKey(3),
                             jnp.zeros((2, HW, HW, 4, 6)))
    return model, tx, state


def _run_both(model, tx, state_factory, mesh, xs, ys, masks, rngs):
    step = make_gat_train_step(model, tx)
    state_a = mesh.put_replicated(state_factory())
    logs_a = []
    for i in range(K):
        xb, yb, mb = mesh.put_batch(xs[i], ys[i], masks[i])
        state_a, logs = step(state_a, xb, yb, mb, rngs[i])
        logs_a.append(logs)

    state_b = mesh.put_replicated(state_factory())
    megastep = make_gat_megastep(model, tx)
    xsd, ysd, msd = mesh.put_megabatch(xs, ys, masks)
    state_b, logs_b = megastep(state_b, xsd, ysd, msd, rngs)
    return state_a, logs_a, state_b, logs_b


@pytest.mark.slow
def test_gat_megastep_sequencing_strict_sgd():
    """SGD: params after K scanned steps == K sequential steps (2e-6)."""
    xs, ys, masks, rngs = _data()
    mesh = MeshContext.create(data=4)
    model, tx, _ = _build("sgd")
    state_a, logs_a, state_b, logs_b = _run_both(
        model, tx, lambda: _build("sgd")[2], mesh, xs, ys, masks, rngs)

    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # last-step scalar loss + exact running_nd sums
    np.testing.assert_allclose(
        float(logs_b["loss"]), float(logs_a[-1]["loss"]), rtol=1e-5)
    want = np.sum([np.asarray(l["running_nd"]) for l in logs_a], axis=0)
    np.testing.assert_allclose(
        np.asarray(logs_b["running_nd"]), want, rtol=1e-5)


@pytest.mark.slow
def test_gat_megastep_adam_smoke():
    """Adam (the production optimizer): close after K steps; exact metric
    accumulator sums."""
    xs, ys, masks, rngs = _data(seed=7)
    mesh = MeshContext.create(data=4)
    model, tx, _ = _build("adam", lr=1e-3)
    state_a, logs_a, state_b, logs_b = _run_both(
        model, tx, lambda: _build("adam", lr=1e-3)[2],
        mesh, xs, ys, masks, rngs)

    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    want = np.sum([np.asarray(l["running_nd"]) for l in logs_a], axis=0)
    np.testing.assert_allclose(
        np.asarray(logs_b["running_nd"]), want, rtol=1e-5)


@pytest.mark.slow
def test_gat_driver_megastep_matches_single_step_epoch(tmp_path):
    """The user-launchable path (--megastep 4 / config MEGASTEP): one
    synthetic epoch under megastep matches the single-step epoch (same
    seed -> same batches and PRNG stream; f32 reduction-order tolerance).
    """
    from extended_gan_tpu.train.gat_driver import train

    common = dict(
        model_type="temporal", optimizer="adam", mapping_type="conv",
        train_batch_size=8, test_batch_size=8, epochs=1, max_batches=8,
        learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(16, 16), dataset="synthetic", seed=41,
    )
    s_single, h_single = train(output_path=str(tmp_path / "a"), **common)
    s_mega, h_mega = train(output_path=str(tmp_path / "b"), megastep=4,
                           **common)

    np.testing.assert_allclose(
        h_mega["train_loss"][-1], h_single["train_loss"][-1], rtol=1e-4)
    np.testing.assert_allclose(
        h_mega["val_loss"][-1], h_single["val_loss"][-1], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_mega.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.slow
def test_gat_megastep_preemption_resumes(tmp_path, monkeypatch):
    """Megastep + step-granular preemption interplay: a shutdown firing
    between K-step programs snapshots on a loader-batch boundary and the
    resumed run (single-step mode) completes with finite metrics."""
    import os

    from extended_gan_tpu.train import preempt
    from extended_gan_tpu.train.checkpoint import (
        MID_EPOCH_STRIDE,
        CheckpointManager,
    )
    from extended_gan_tpu.train.gat_driver import train

    class _FireSecondRead:
        def __enter__(self):
            return self

        def __exit__(self, *e):
            return False

        _reads = 0

        @property
        def requested(self):
            type(self)._reads += 1
            return type(self)._reads >= 2

    common = dict(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        train_batch_size=8, test_batch_size=8, epochs=2, max_batches=8,
        learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(16, 16), dataset="synthetic", seed=47,
        checkpoint_every=10,
    )
    real = preempt.GracefulShutdown
    monkeypatch.setattr(preempt, "GracefulShutdown", _FireSecondRead)
    out = str(tmp_path / "run")
    # megastep=4: reads happen once per 4-step program -> fires after the
    # SECOND program = 8 loader batches into epoch 1
    _, h1 = train(output_path=out, resume=True, megastep=4, **common)
    assert len(h1.get("val_loss", [])) == 0, "epoch 1 should be partial"
    mgr = CheckpointManager(os.path.join(out, "checkpoints"))
    step = mgr.latest_step()
    mgr.close()
    assert step == 1 * MID_EPOCH_STRIDE + 8, step

    monkeypatch.setattr(preempt, "GracefulShutdown", real)
    s, h = train(output_path=out, resume=True, **common)
    assert len(h["val_loss"]) == 2
    assert np.isfinite(h["val_loss"][-1])
