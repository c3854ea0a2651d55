"""FusedProp (arxiv 2004.03335) fusion losslessness.

``fused_prop=True`` computes the fake batch's G->D chain once and pulls
BOTH cotangents (D-fake: bce vs 0; G: bce vs 1) back through it in one
vmapped vjp. Its SEMANTICS deviate from the reference order on purpose
(G trains against pre-update Ds — simultaneous gradient descent; one
shared TD dropout mask; two BN updates per step instead of three), so
the oracle here is a NAIVE implementation of those same semantics with
two separate backwards: the fusion must match it to float-reassociation
precision, with BatchNorm and dropout LIVE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.core import KeySeq
from extended_gan_tpu.train.adversarial import _apply_train_with_params
from extended_gan_tpu.train.dcgan_driver import build_dcgan
from extended_gan_tpu.train.dcgan_trainer import (
    GANStates,
    make_dcgan_megastep,
    make_dcgan_train_step,
)
from extended_gan_tpu.train.losses import bce

PARAMS = {"bsize": 8, "imsize": 64, "nc": 4, "ngf": 8, "ndf": 8,
          "nepochs": 1, "lr": 2e-4, "beta1": 0.5, "nz": 100,
          "save_epoch": 0}


def _batch(b=8, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(b, 64, 64, 4).astype(np.float32)
    y = rng.rand(b, 64, 64, 4).astype(np.float32)
    mask = np.concatenate(
        [np.ones(b - 2, np.float32), np.zeros(2, np.float32)])
    return x, y, mask


def _naive_simultaneous_step(models, txs, states, x, y, mask, rng):
    """Two-backward implementation of fused_prop's semantics: same key
    split, same BN-stat threading, same pre-update-D G loss — with the
    D-fake and G gradients each computed by their own value_and_grad."""
    g_model, fd_model, td_model = models
    g_tx, fd_tx, td_tx = txs
    k_g, k_td1, k_td2 = jax.random.split(rng, 3)
    xy_real = jnp.concatenate([x, y], axis=-1)

    def d_real_loss(fd_params, td_params):
        p_rf, fd_bs = _apply_train_with_params(
            fd_model, fd_params, states.fd.batch_stats, y)
        p_rt, td_bs = _apply_train_with_params(
            td_model, td_params, states.td.batch_stats, xy_real,
            rngs={"dropout": k_td1})
        return (bce(p_rf.reshape(-1), 1.0, mask=mask)
                + bce(p_rt.reshape(-1), 1.0, mask=mask)), (fd_bs, td_bs)

    (_, (fd_bs1, td_bs1)), d_grads_real = jax.value_and_grad(
        d_real_loss, argnums=(0, 1), has_aux=True)(
        states.fd.params, states.td.params)

    fake, g_bs1 = _apply_train_with_params(
        g_model, states.g.params, states.g.batch_stats, x,
        rngs={"dropout": k_g})
    fake_sg = jax.lax.stop_gradient(fake)

    def d_fake_loss(fd_params, td_params):
        p_ff, fd_bs = _apply_train_with_params(
            fd_model, fd_params, fd_bs1, fake_sg)
        p_ft, td_bs = _apply_train_with_params(
            td_model, td_params, td_bs1,
            jnp.concatenate([x, fake_sg], axis=-1),
            rngs={"dropout": k_td2})
        return (bce(p_ff.reshape(-1), 0.0, mask=mask)
                + bce(p_ft.reshape(-1), 0.0, mask=mask)), (fd_bs, td_bs)

    (_, (fd_bs2, td_bs2)), d_grads_fake = jax.value_and_grad(
        d_fake_loss, argnums=(0, 1), has_aux=True)(
        states.fd.params, states.td.params)

    def g_loss_fn(g_params):
        fake2, _ = _apply_train_with_params(
            g_model, g_params, states.g.batch_stats, x,
            rngs={"dropout": k_g})
        p_f, _ = _apply_train_with_params(
            fd_model, states.fd.params, fd_bs1, fake2)
        p_t, _ = _apply_train_with_params(
            td_model, states.td.params, td_bs1,
            jnp.concatenate([x, fake2], axis=-1),
            rngs={"dropout": k_td2})
        return (bce(p_f.reshape(-1), 1.0, mask=mask)
                + bce(p_t.reshape(-1), 1.0, mask=mask))

    err_g, g_grads = jax.value_and_grad(g_loss_fn)(states.g.params)

    add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
    fd_state = states.fd.apply_gradients(
        fd_tx, add(d_grads_real[0], d_grads_fake[0])).replace(
        batch_stats=fd_bs2)
    td_state = states.td.apply_gradients(
        td_tx, add(d_grads_real[1], d_grads_fake[1])).replace(
        batch_stats=td_bs2)
    g_state = states.g.apply_gradients(g_tx, g_grads).replace(
        batch_stats=g_bs1)
    return GANStates(g=g_state, fd=fd_state, td=td_state), err_g


def _run_pair(models, txs, states_a, states_b, n_steps=2, key_seed=5):
    step = make_dcgan_train_step(*models, *txs, fused_prop=True)
    naive = jax.jit(
        lambda s, x, y, m, r: _naive_simultaneous_step(
            models, txs, s, x, y, m, r))
    x, y, mask = _batch()
    keys = KeySeq(key_seed)
    logs_a = err_g_b = None
    for _ in range(n_steps):
        k = keys.next()
        states_a, logs_a = step(states_a, x, y, mask, k)
        states_b, err_g_b = naive(states_b, x, y, mask, k)
    return states_a, logs_a, states_b, err_g_b


@pytest.mark.slow
def test_fused_prop_matches_naive_strict_sgd():
    """The fusion is lossless: fused_prop == two-backward naive twin of
    the same simultaneous semantics, BN + dropout LIVE. Under SGD a
    gradient difference shows up as ~lr * diff in the params, so the
    tolerance can sit at float-reassociation scale (the Adam variant
    below needs a sign-resolution budget instead)."""
    import optax

    from extended_gan_tpu.core import KeySeq as KS
    from extended_gan_tpu.train.state import create_net_state
    from extended_gan_tpu.models.dcgan import (
        FrameDiscriminator, Generator, TemporalDiscriminator)

    def build_sgd(seed=7):
        g = Generator(nc=4)
        fd = FrameDiscriminator(nc=4, ndf=8)
        td = TemporalDiscriminator(nc=4, ndf=8)
        txs = tuple(optax.sgd(1e-3) for _ in range(3))
        ks = KS(seed)
        s1 = jnp.zeros((2, 64, 64, 4), jnp.float32)
        s2 = jnp.zeros((2, 64, 64, 8), jnp.float32)
        states = GANStates(
            g=create_net_state(g, txs[0], ks.next(), s1),
            fd=create_net_state(fd, txs[1], ks.next(), s1),
            td=create_net_state(td, txs[2], ks.next(), s2),
        )
        return (g, fd, td), txs, states

    models, txs, states_a = build_sgd()
    _, _, states_b = build_sgd()
    states_a, logs_a, states_b, err_g_b = _run_pair(
        models, txs, states_a, states_b)

    np.testing.assert_allclose(float(logs_a["errG"]), float(err_g_b),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(states_a),
                    jax.tree_util.tree_leaves(states_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.slow
def test_fused_prop_matches_naive_adam_budget():
    """Same comparison under the production Adam optimizers: identical
    up to the sign-resolution budget (a near-zero-gradient coordinate
    resolves ~1e-7 reassociation noise to a sign and moves ~lr/step)."""
    n_steps = 2
    models, txs, states_a, _ = build_dcgan(PARAMS)
    _, _, states_b, _ = build_dcgan(PARAMS)
    states_a, logs_a, states_b, err_g_b = _run_pair(
        models, txs, states_a, states_b, n_steps=n_steps)

    np.testing.assert_allclose(float(logs_a["errG"]), float(err_g_b),
                               rtol=1e-5, atol=1e-6)
    budget = 2 * 2e-4 * n_steps
    for a, b in zip(jax.tree_util.tree_leaves(states_a),
                    jax.tree_util.tree_leaves(states_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=budget)


@pytest.mark.slow
def test_fused_prop_trains_sanely():
    """A few steps move the losses finitely (no NaN, D not frozen)."""
    models, txs, states, _ = build_dcgan(PARAMS)
    step = make_dcgan_train_step(*models, *txs, fused_prop=True)
    x, y, mask = _batch(seed=3)
    keys = KeySeq(9)
    for _ in range(3):
        states, logs = step(states, x, y, mask, keys.next())
        for k in ("errFD", "errTD", "errG"):
            assert np.isfinite(float(logs[k])), (k, logs[k])


@pytest.mark.slow
def test_fused_prop_megastep_runs():
    models, txs, states, _ = build_dcgan(PARAMS)
    mega = make_dcgan_megastep(*models, *txs, fused_prop=True)
    K = 2
    rng = np.random.RandomState(4)
    xs = rng.rand(K, 8, 64, 64, 4).astype(np.float32)
    ys = rng.rand(K, 8, 64, 64, 4).astype(np.float32)
    ms = np.ones((K, 8), np.float32)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(K)])
    states, logs = mega(states, xs, ys, ms, rngs)
    assert np.isfinite(float(logs["errG"]))


def _naive_disc_simultaneous_step(models, txs, states, x, y, mask, rng):
    """Two-backward twin of fused_prop x fused_disc: the SAME doubled-
    batch chain (same key split, mixed-2B BN stats, one TD dropout mask),
    with D and G gradients each from their own value_and_grad."""
    g_model, fd_model, td_model = models
    g_tx, fd_tx, td_tx = txs
    k_g, k_td1 = jax.random.split(rng, 2)
    b = y.shape[0]

    def chain(g_params, fd_params, td_params):
        fake, g_bs = _apply_train_with_params(
            g_model, g_params, states.g.batch_stats, x,
            rngs={"dropout": k_g})
        y_all = jnp.concatenate([y, fake], axis=0)
        xy_all = jnp.concatenate(
            [jnp.concatenate([x, y], axis=-1),
             jnp.concatenate([x, fake], axis=-1)], axis=0)
        p_f_all, fd_bs = _apply_train_with_params(
            fd_model, fd_params, states.fd.batch_stats, y_all)
        p_t_all, td_bs = _apply_train_with_params(
            td_model, td_params, states.td.batch_stats, xy_all,
            rngs={"dropout": k_td1})
        return (p_f_all.reshape(-1), p_t_all.reshape(-1),
                fake, g_bs, fd_bs, td_bs)

    def d_loss(fd_params, td_params):
        pf, pt, fake, g_bs, fd_bs, td_bs = chain(
            states.g.params, fd_params, td_params)
        loss = (bce(pf[:b], 1.0, mask=mask) + bce(pf[b:], 0.0, mask=mask)
                + bce(pt[:b], 1.0, mask=mask) + bce(pt[b:], 0.0, mask=mask))
        return loss, (fake, g_bs, fd_bs, td_bs)

    (_, (fake, g_bs1, fd_bs2, td_bs2)), (fd_grads, td_grads) = (
        jax.value_and_grad(d_loss, argnums=(0, 1), has_aux=True)(
            states.fd.params, states.td.params))

    def g_loss(g_params):
        pf, pt, *_ = chain(g_params, states.fd.params, states.td.params)
        return (bce(pf[b:], 1.0, mask=mask) + bce(pt[b:], 1.0, mask=mask))

    err_g, g_grads = jax.value_and_grad(g_loss)(states.g.params)

    fd_state = states.fd.apply_gradients(fd_tx, fd_grads).replace(
        batch_stats=fd_bs2)
    td_state = states.td.apply_gradients(td_tx, td_grads).replace(
        batch_stats=td_bs2)
    g_state = states.g.apply_gradients(g_tx, g_grads).replace(
        batch_stats=g_bs1)
    return GANStates(g=g_state, fd=fd_state, td=td_state), err_g


@pytest.mark.slow
def test_fused_prop_disc_matches_naive_strict_sgd():
    """fused_prop x fused_disc (the minimal chain) == its two-backward
    naive twin at reassociation scale under SGD, BN + dropout live."""
    import optax

    from extended_gan_tpu.models.dcgan import (
        FrameDiscriminator, Generator, TemporalDiscriminator)
    from extended_gan_tpu.train.state import create_net_state

    def build_sgd(seed=7):
        g = Generator(nc=4)
        fd = FrameDiscriminator(nc=4, ndf=8)
        td = TemporalDiscriminator(nc=4, ndf=8)
        txs = tuple(optax.sgd(1e-3) for _ in range(3))
        ks = KeySeq(seed)
        s1 = jnp.zeros((2, 64, 64, 4), jnp.float32)
        s2 = jnp.zeros((2, 64, 64, 8), jnp.float32)
        states = GANStates(
            g=create_net_state(g, txs[0], ks.next(), s1),
            fd=create_net_state(fd, txs[1], ks.next(), s1),
            td=create_net_state(td, txs[2], ks.next(), s2),
        )
        return (g, fd, td), txs, states

    models, txs, states_a = build_sgd()
    _, _, states_b = build_sgd()
    step = make_dcgan_train_step(*models, *txs, fused_prop=True,
                                 fused_disc=True)
    naive = jax.jit(lambda s, x, y, m, r: _naive_disc_simultaneous_step(
        models, txs, s, x, y, m, r))

    x, y, mask = _batch()
    keys = KeySeq(5)
    logs_a = err_g_b = None
    for _ in range(2):
        k = keys.next()
        states_a, logs_a = step(states_a, x, y, mask, k)
        states_b, err_g_b = naive(states_b, x, y, mask, k)

    np.testing.assert_allclose(float(logs_a["errG"]), float(err_g_b),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(states_a),
                    jax.tree_util.tree_leaves(states_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.slow
def test_fused_prop_composes_with_packed_g():
    """Model-layout mode (packed_g) and step-body mode (fused_prop) are
    orthogonal; together they run and match the unpacked fused_prop step
    within the packed layout's reassociation scale."""
    models_u, txs, states_u, _ = build_dcgan(PARAMS)
    models_p, _, states_p, _ = build_dcgan(PARAMS, packed_g=True)
    step_u = make_dcgan_train_step(*models_u, *txs, fused_prop=True)
    step_p = make_dcgan_train_step(*models_p, *txs, fused_prop=True)
    x, y, mask = _batch(seed=6)
    k = jax.random.PRNGKey(12)
    states_u, logs_u = step_u(states_u, x, y, mask, k)
    states_p, logs_p = step_p(states_p, x, y, mask, k)
    for key in ("errFD", "errTD", "errG"):
        np.testing.assert_allclose(float(logs_u[key]), float(logs_p[key]),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_prop_shrinks_compiled_program():
    """Hardware-independent structural evidence: the OPTIMIZED HLO of the
    fused_prop step contains strictly fewer convolution ops than the
    default body's (measured 68 vs 86 on the CPU backend), while
    dedup_g's count EQUALS the default's — the compiled-program proof
    that XLA CSEs dedup's recomputed G forward but cannot merge the
    default body's two differently-cotangented backwards."""
    x = jnp.zeros((8, 64, 64, 4))
    y = jnp.zeros((8, 64, 64, 4))
    m = jnp.ones((8,))
    k = jax.random.PRNGKey(0)

    def conv_count(**kw):
        models, txs, states, _ = build_dcgan(PARAMS)
        step = make_dcgan_train_step(*models, *txs, **kw)
        txt = step.lower(states, x, y, m, k).compile().as_text()
        return txt.count(" convolution(")

    n_default = conv_count()
    n_dedup = conv_count(dedup_g=True)
    n_fused = conv_count(fused_prop=True)
    n_minimal = conv_count(fused_prop=True, fused_disc=True)
    assert n_dedup == n_default, (n_dedup, n_default)
    assert n_fused < n_default, (n_fused, n_default)
    # the composed minimal chain (measured 42 vs 86) cuts past either
    # mode alone
    assert n_minimal < n_fused, (n_minimal, n_fused)


@pytest.mark.slow
def test_full_mode_stack_driver(tmp_path):
    """DP8 x megastep x fused_prop x fused_disc x packed_g in one run —
    the whole opt-in stack composes through the real driver."""
    import numpy as np

    from extended_gan_tpu.train.dcgan_driver import train

    _, hist = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=4,
        synthetic=True, seed=31, out_dir=str(tmp_path / "run"),
        data_axis=8, megastep=2, fused_prop=True, fused_disc=True,
        packed_g=True,
        params={"ngf": 8, "ndf": 8, "save_epoch": 0},
    )
    assert np.isfinite(hist.history["train_mse"][-1])
    assert np.isfinite(hist.history["pred_mse"][-1])


def test_fused_prop_excludes_dedup_g():
    models, txs, _, _ = build_dcgan(PARAMS)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_dcgan_train_step(*models, *txs, fused_prop=True, dedup_g=True)
