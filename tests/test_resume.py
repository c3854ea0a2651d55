import json
import os

import numpy as np
import pytest

from extended_gan_tpu.data.synthetic import make_kmni_dataset


@pytest.fixture(scope="module")
def kmni_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kmni_resume")
    make_kmni_dataset(str(d), n_train_files=1, n_test_files=1,
                      frames_per_file=16, n_vertices=6, hw=16)
    return str(d)


def test_gat_checkpoint_and_resume(kmni_dir, tmp_path):
    """Interrupt after 1 epoch, resume, and land at epoch 3 with continuous
    history — the failure-recovery path the reference lacks (SURVEY 5)."""
    from extended_gan_tpu.train.gat_driver import train

    out = str(tmp_path / "exp")
    common = dict(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        output_path=out, train_batch_size=4, test_batch_size=4,
        learning_rate=1e-3, lr_step=1, gamma=0.95,
        downsample_size=(12, 12), preprocessed_folder=kmni_dir,
        dataset="kmni", max_batches=2, checkpoint_every=1,
    )
    train(epochs=1, **common)
    h1 = json.load(open(os.path.join(out, "history.json")))
    assert len(h1["val_loss"]) == 1

    state, history = train(epochs=3, resume=True, **common)
    assert len(history["val_loss"]) == 3
    # first epoch's numbers survived the restart
    assert history["val_loss"][0] == h1["val_loss"][0]
    assert os.path.isdir(os.path.join(out, "checkpoints"))


def test_resume_restores_step_lr_schedule(kmni_dir, tmp_path):
    """StepLR must continue decaying from the checkpointed epoch, not snap
    back to base_lr (gamma=0.5 makes drift obvious)."""
    from extended_gan_tpu.train.gat_driver import train
    from extended_gan_tpu.train.optim import get_learning_rate

    out = str(tmp_path / "exp_lr")
    common = dict(
        model_type="temporal", optimizer="adam", mapping_type="linear",
        output_path=out, train_batch_size=4, test_batch_size=4,
        learning_rate=1e-2, lr_step=1, gamma=0.5,
        downsample_size=(12, 12), preprocessed_folder=kmni_dir,
        dataset="kmni", max_batches=2, checkpoint_every=1,
    )
    train(epochs=2, **common)          # LR after 2 epochs: 1e-2 * 0.25
    state, _ = train(epochs=3, resume=True, **common)
    # after epoch 3 the schedule must be base * 0.5^3
    assert abs(get_learning_rate(state.opt_state) - 1e-2 * 0.125) < 1e-9


@pytest.mark.slow
def test_dcgan_checkpoint_and_resume(tmp_path):
    """Interrupt the GAN after 1 epoch, resume, land at epoch 3 with
    continuous history and the exact same numbers as an uninterrupted run —
    the reference defines save_epoch (dcgan/train.py:197) but never saves."""
    from extended_gan_tpu.train.dcgan_driver import train

    common = dict(
        epochs=3, train_batch_size=8, test_batch_size=8, max_batches=2,
        synthetic=True, seed=101, params={"ndf": 8, "save_epoch": 1},
    )
    # uninterrupted run (the oracle)
    _, hist_full = train(out_dir=str(tmp_path / "full"), **common)

    out = str(tmp_path / "resumed")
    _, h1 = train(**{**common, "epochs": 1, "out_dir": out})
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    _, h2 = train(**common, out_dir=out, resume=True)

    assert len(h2.history["pred_mse"]) == 3
    assert h2.history["pred_mse"][0] == h1.history["pred_mse"][0]
    # kill-and-resume == never-killed (states, PRNG stream, history intact)
    np.testing.assert_allclose(
        h2.history["pred_mse"], hist_full.history["pred_mse"], rtol=1e-6
    )
    np.testing.assert_allclose(
        h2.history["train_mse"], hist_full.history["train_mse"], rtol=1e-6
    )


@pytest.mark.slow
def test_cyclegan_checkpoint_and_resume(tmp_path):
    from extended_gan_tpu.train.cyclegan_driver import train

    common = dict(
        epochs=2, train_batch_size=8, test_batch_size=8, max_batches=2,
        imsize=64, ndf=8, synthetic=True, seed=77, save_epoch=1,
    )
    _, hist_full = train(out_dir=str(tmp_path / "full"), **common)

    out = str(tmp_path / "resumed")
    train(**{**common, "epochs": 1, "out_dir": out})
    _, h2 = train(**common, out_dir=out, resume=True)

    assert len(h2.history["pred_mse"]) == 2
    np.testing.assert_allclose(
        h2.history["pred_mse"], hist_full.history["pred_mse"], rtol=1e-6
    )
    np.testing.assert_allclose(
        h2.history["cycle_l1"], hist_full.history["cycle_l1"], rtol=1e-6
    )


@pytest.mark.slow
def test_cyclegan_resume_reapplies_tp_sharding(tmp_path):
    """Resuming a TP run must re-shard the restored discriminators: a
    round-1-style put_replicated on the resume path silently dropped the
    model-axis sharding (and TP's memory saving) for the rest of the run."""
    import jax

    from extended_gan_tpu.train.cyclegan_driver import train

    common = dict(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        imsize=64, ndf=8, synthetic=True, seed=77, save_epoch=1,
        data_axis=4, model_axis=2, tp_min_channels=16,
    )
    out = str(tmp_path / "tp")
    train(out_dir=out, **common)
    states, _ = train(**{**common, "epochs": 2}, out_dir=out, resume=True)

    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(states.d_x.params)
        if hasattr(leaf, "sharding") and leaf.ndim == 4
        and leaf.shape[-1] >= 16
        and "model" in (leaf.sharding.spec or ())
    ]
    assert sharded, "wide d_x conv kernels lost their TP sharding on resume"


@pytest.mark.slow
def test_gat_checkpoint_carries_prng_stream(tmp_path):
    """The conv-GAT checkpoint must persist the dropout-key stream so a
    resumed run CONTINUES it instead of replaying epoch 1..N's masks
    (round-2 review; the GAN drivers already did this)."""
    import jax.numpy as jnp

    from extended_gan_tpu.core import KeySeq
    from extended_gan_tpu.train.checkpoint import CheckpointManager
    from extended_gan_tpu.train.gat_driver import train

    out = tmp_path / "exp"
    train(
        model_type="temporal", mapping_type="conv", dataset="synthetic",
        preprocessed_folder="", epochs=1, train_batch_size=8,
        test_batch_size=8, downsample_size=(12, 12), max_batches=2,
        output_path=str(out), checkpoint_every=1, seed=7,
    )
    # resume restores the stream: the template includes "key", so this
    # raises a tree-structure mismatch if the save had not persisted it
    _, hist = train(
        model_type="temporal", mapping_type="conv", dataset="synthetic",
        preprocessed_folder="", epochs=2, train_batch_size=8,
        test_batch_size=8, downsample_size=(12, 12), max_batches=2,
        output_path=str(out), checkpoint_every=1, seed=7, resume=True,
    )
    assert len(hist["train_loss"]) == 2

    # back-compat: a pre-round-2 checkpoint without the key still resumes
    out2 = tmp_path / "legacy"
    os.makedirs(out2)
    mgr = CheckpointManager(str(out2 / "checkpoints"))
    from extended_gan_tpu.train.optim import make_optimizer
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.state import create_net_state

    model = build_model("temporal", image_width=12, image_height=12,
                        n_vertices=6, mapping_type="conv")
    st = create_net_state(
        model, make_optimizer("adam", 1e-3, weight_decay=0.01),
        KeySeq(7).next(), jnp.zeros((2, 12, 12, 4, 6)))
    mgr.save(1, {"state": st, "epoch": 1, "lr": 1e-3, "best": 0.5})
    mgr.close()
    _, hist2 = train(
        model_type="temporal", mapping_type="conv", dataset="synthetic",
        preprocessed_folder="", epochs=2, train_batch_size=8,
        test_batch_size=8, downsample_size=(12, 12), max_batches=2,
        output_path=str(out2), checkpoint_every=1, seed=7, resume=True,
    )
    assert len(hist2["train_loss"]) == 1  # epoch 2 only
