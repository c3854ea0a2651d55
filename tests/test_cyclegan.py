import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.train.cyclegan_driver import build_cyclegan


def _tiny():
    return build_cyclegan(nc=4, ndf=8, imsize=64, seed=0)


def test_cyclegan_step_updates_all_four_nets():
    models, txs, states, step, eval_step, keys = _tiny()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 64, 64, 4).astype(np.float32))
    y = jnp.asarray(rng.rand(4, 64, 64, 4).astype(np.float32))
    mask = jnp.ones(4)
    before = {
        name: np.asarray(jax.tree_util.tree_leaves(getattr(states, name).params)[0])
        for name in ("g_xy", "g_yx", "d_x", "d_y")
    }
    states, logs = step(states, x, y, mask, keys.next())
    for name, b in before.items():
        after = np.asarray(
            jax.tree_util.tree_leaves(getattr(states, name).params)[0])
        assert not np.allclose(b, after), f"{name} did not update"
    for k in ("g_loss", "adv_loss", "cycle_loss", "d_x_loss", "d_y_loss"):
        assert np.isfinite(float(logs[k])), k
    assert float(logs["cycle_loss"]) > 0


@pytest.mark.slow
def test_cycle_loss_decreases_with_training():
    models, txs, states, step, eval_step, keys = _tiny()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(8, 64, 64, 4).astype(np.float32) * 0.5)
    y = jnp.asarray(x + 0.1)  # simple learnable relation
    mask = jnp.ones(8)
    first = None
    last = None
    for i in range(8):
        states, logs = step(states, x, y, mask, keys.next())
        if i == 0:
            first = float(logs["cycle_loss"])
        last = float(logs["cycle_loss"])
    assert last < first


@pytest.mark.slow
def test_cyclegan_end_to_end_synthetic(tmp_path):
    from extended_gan_tpu.train.cyclegan_driver import train

    states, history = train(
        epochs=1, train_batch_size=4, test_batch_size=4,
        imsize=64, ndf=8, max_batches=2, synthetic=True,
        out_dir=str(tmp_path),
        data_location=str(tmp_path / "nonexistent"),
    )
    h = history.history
    assert "pred_mse" in h and "cycle_l1" in h
    import os

    assert os.path.exists(tmp_path / "imgs" / "pred.png")
