"""Megastep (K steps scanned inside one XLA program) == K sequential
single steps fed the same rng sequence.

Two tiers:

- STRICT sequencing test under SGD: any real megastep bug (wrong rng
  threading, stale batch_stats, swapped batch order) produces O(1)
  errors; f32 reduction-order differences between the scanned and
  standalone programs only move SGD params by ~lr * 1e-6.
- Adam smoke with a loose tolerance: first-step Adam normalizes by
  sqrt(nu) ~ |grad|, so on near-cancelling conv-BIAS gradient sums a
  ~1e-6 reduction-order wiggle legitimately moves a param by O(lr) —
  the same sensitivity the DP1-vs-DP8 tests already tolerate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.models.dcgan import (
    FrameDiscriminator,
    Generator,
    TemporalDiscriminator,
)
from extended_gan_tpu.parallel import MeshContext
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import (
    GANStates,
    make_dcgan_megastep,
    make_dcgan_train_step,
)
from extended_gan_tpu.train.state import create_net_state

K, B = 3, 8
PARAMS = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 0}


def _data(seed=0):
    rng = np.random.RandomState(seed)
    xs = rng.rand(K, B, 64, 64, 4).astype(np.float32)
    ys = rng.rand(K, B, 64, 64, 4).astype(np.float32)
    masks = np.ones((K, B), np.float32)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(K)])
    return xs, ys, masks, rngs


def _build_sgd(seed=7):
    g = Generator(nc=4)
    fd = FrameDiscriminator(nc=4, ndf=8)
    td = TemporalDiscriminator(nc=4, ndf=8)
    txs = tuple(optax.sgd(1e-3) for _ in range(3))
    keys = KeySeq(seed)
    s1 = jnp.zeros((2, 64, 64, 4), jnp.float32)
    s2 = jnp.zeros((2, 64, 64, 8), jnp.float32)
    states = GANStates(
        g=create_net_state(g, txs[0], keys.next(), s1),
        fd=create_net_state(fd, txs[1], keys.next(), s1),
        td=create_net_state(td, txs[2], keys.next(), s2),
    )
    return (g, fd, td), txs, states


def _run_both(models, txs, states_factory, mesh, xs, ys, masks, rngs):
    states_a = mesh.put_replicated(states_factory())
    step = make_dcgan_train_step(*models, *txs)
    logs_a = None
    for i in range(len(xs)):
        xb, yb, mb = mesh.put_batch(xs[i], ys[i], masks[i])
        states_a, logs_a = step(states_a, xb, yb, mb, rngs[i])

    states_b = mesh.put_replicated(states_factory())
    megastep = make_dcgan_megastep(*models, *txs)
    xsd, ysd, msd = mesh.put_megabatch(xs, ys, masks)
    states_b, logs_b = megastep(states_b, xsd, ysd, msd, rngs)
    return states_a, logs_a, states_b, logs_b


@pytest.mark.slow
def test_megastep_sequencing_strict_sgd():
    xs, ys, masks, rngs = _data()
    mesh = MeshContext.create(data=4)
    models, txs, _ = _build_sgd()
    # fresh states per run: the fused steps DONATE their input state
    states_a, logs_a, states_b, logs_b = _run_both(
        models, txs, lambda: _build_sgd()[2], mesh, xs, ys, masks, rngs)

    for a, b in zip(jax.tree_util.tree_leaves(states_a),
                    jax.tree_util.tree_leaves(states_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6)
    np.testing.assert_allclose(
        float(logs_b["errG"]), float(logs_a["errG"]), rtol=1e-6)


@pytest.mark.slow
def test_megastep_adam_smoke_and_metric_sums():
    xs, ys, masks, rngs = _data(seed=1)
    mesh = MeshContext.create(data=4)

    def factory():
        _, _, states, _ = build_dcgan(PARAMS, seed=7)
        return states

    models, txs, _, _ = build_dcgan(PARAMS, seed=7)

    # sequential accumulations of the (num, denom) metric pairs
    states_a = mesh.put_replicated(factory())
    step = make_dcgan_train_step(*models, *txs)
    nd_sums = None
    for i in range(K):
        xb, yb, mb = mesh.put_batch(xs[i], ys[i], masks[i])
        states_a, logs_a = step(states_a, xb, yb, mb, rngs[i])
        nd = {k: np.asarray(v) for k, v in logs_a.items()
              if k.endswith("_nd")}
        nd_sums = nd if nd_sums is None else {
            k: nd_sums[k] + nd[k] for k in nd}

    states_b = mesh.put_replicated(factory())
    megastep = make_dcgan_megastep(*models, *txs)
    xsd, ysd, msd = mesh.put_megabatch(xs, ys, masks)
    states_b, logs_b = megastep(states_b, xsd, ysd, msd, rngs)

    # accumulated metrics agree tightly; scalars are the last step's
    for k, expected in nd_sums.items():
        np.testing.assert_allclose(np.asarray(logs_b[k]), expected,
                                   rtol=1e-5)
    np.testing.assert_allclose(float(logs_b["errG"]), float(logs_a["errG"]),
                               rtol=1e-4)
    # params within the Adam near-zero-gradient sensitivity envelope
    for a, b in zip(jax.tree_util.tree_leaves(states_a.g.params),
                    jax.tree_util.tree_leaves(states_b.g.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=K * 4 * PARAMS["lr"])


@pytest.mark.slow
def test_dcgan_driver_megastep_matches_single_step_epoch(tmp_path):
    """The user-launchable path (python -m dcgan --megastep 4): one
    synthetic epoch under megastep matches the single-step epoch (same
    seed -> same batches and PRNG stream; f32 reduction-order tolerance).
    """
    from extended_gan_tpu.train.dcgan_driver import train

    common = dict(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=8,
        synthetic=True, seed=33,
        params={"imsize": 64, "ngf": 8, "ndf": 8, "save_epoch": 0},
    )
    s_single, h_single = train(out_dir=str(tmp_path / "a"), **common)
    s_mega, h_mega = train(out_dir=str(tmp_path / "b"), megastep=4,
                           **common)

    # GAN training (3 Adams + BN + adversarial feedback) amplifies the
    # scan-vs-standalone f32 reduction-order wiggle faster than the MSE
    # trainer; 1e-3 relative still catches any real sequencing bug (those
    # produce O(1) errors — see the strict SGD test above)
    for key in ("train_mse", "pred_mse"):
        np.testing.assert_allclose(
            h_mega.history[key][-1], h_single.history[key][-1], rtol=1e-3)
    for net in ("g", "fd", "td"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(s_single, net).params),
            jax.tree_util.tree_leaves(getattr(s_mega, net).params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3)
