"""Device-resident dataset mode (data/resident.py).

Proves the three claims VERDICT r3 directive #2 requires:

1. EQUIVALENCE — the resident window universe is batch-for-batch equal to
   the streaming loaders' (KmniLoader, H5SequenceLoader) with shuffling
   off: same truncate-to-multiple window set, same stride-1 starts, same
   normalization, never spanning file boundaries.
2. NUMERICS — the resident megastep (on-device gathers) produces the
   SAME trained state as the streaming megastep fed the same windows.
3. MECHANICS — the epoch shuffle is a permutation of the full window
   set (multiset-preserving), the ragged tail is -1-padded and masked,
   and the whole path runs sharded on the 8-virtual-device DP mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extended_gan_tpu.data.resident import (
    ResidentVideos,
    make_dcgan_resident_megastep,
    make_gat_resident_megastep,
)
from extended_gan_tpu.data.streaming import get_h5_loaders, get_kmni_loaders
from extended_gan_tpu.data.synthetic import (
    ensure_synthetic_h5,
    ensure_synthetic_kmni,
)
from extended_gan_tpu.parallel import MeshContext


@pytest.fixture(scope="module")
def kmni_folder(tmp_path_factory):
    return ensure_synthetic_kmni(
        str(tmp_path_factory.mktemp("kmni")), n_train_files=3,
        frames_per_file=24, hw=24)


@pytest.fixture(scope="module")
def h5_folder(tmp_path_factory):
    return ensure_synthetic_h5(
        str(tmp_path_factory.mktemp("h5")), frames_train=48, frames_test=16,
        h=32, w=32)


def _drain_loader(loader):
    xs, ys = [], []
    for x, y in loader:
        xs.append(np.asarray(x))
        ys.append(np.asarray(y))
    return np.concatenate(xs), np.concatenate(ys)


def _gather_kmni(res, starts):
    """Host mirror of the on-device gather (layout check)."""
    v = np.asarray(res.video)
    s = res.window // 2
    idx = np.asarray(starts)[:, None] + np.arange(res.window)
    wins = np.moveaxis(v[idx], 1, 3)  # (B, H, W, 2S, V)
    return wins[..., :s, :], wins[..., s:, :]


def test_kmni_resident_equals_streaming_unshuffled(kmni_folder):
    crop = 20
    train, _, _ = get_kmni_loaders(8, 8, kmni_folder, crop=crop,
                                   shuffle=False)
    xs_ref, ys_ref = _drain_loader(train)

    res = ResidentVideos.from_kmni(
        kmni_folder + "/train", crop=crop)
    assert res.n_windows == len(xs_ref)
    x, y = _gather_kmni(res, np.asarray(res.starts))
    np.testing.assert_allclose(x, xs_ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y, ys_ref, rtol=0, atol=1e-6)


def test_kmni_resident_power_normalization(kmni_folder):
    res1 = ResidentVideos.from_kmni(kmni_folder + "/train", crop=8)
    res2 = ResidentVideos.from_kmni(kmni_folder + "/train", crop=8,
                                    power=0.5)
    np.testing.assert_allclose(
        np.asarray(res2.video), np.asarray(res1.video) ** 0.5, atol=1e-6)
    assert res2.power == 0.5
    assert res2.normalizing_max == 254.0


def test_h5_resident_equals_streaming_unshuffled(h5_folder):
    train, _ = get_h5_loaders(h5_folder, 8, 8, crop=32, in_seq_len=4,
                              out_seq_len=4, seed=0)
    train.shuffle = False  # get_h5_loaders has no shuffle knob; force off
    xs_ref, ys_ref = _drain_loader(train)
    # streaming yields (b, S, 1, H, W); squeeze to the resident layout
    xs_ref, ys_ref = xs_ref.squeeze(2), ys_ref.squeeze(2)

    res = ResidentVideos.from_h5(h5_folder + "/train", crop=32,
                                 in_seq_len=4, out_seq_len=4)
    assert res.n_windows == len(xs_ref)
    v = np.asarray(res.video)
    idx = np.asarray(res.starts)[:, None] + np.arange(8)
    wins = v[idx]  # (n, 8, H, W)
    np.testing.assert_allclose(wins[:, :4], xs_ref, atol=1e-6)
    np.testing.assert_allclose(wins[:, 4:], ys_ref, atol=1e-6)


def test_arai_resident_equals_streaming_unshuffled(tmp_path):
    from extended_gan_tpu.data.streaming import get_arai_loaders
    from extended_gan_tpu.data.synthetic import make_arai_dataset

    make_arai_dataset(str(tmp_path), n_files=2, frames_per_file=16,
                      n_regions=5, h=12, w=12)
    train, _, _ = get_arai_loaders(4, 2, str(tmp_path),
                                   downsample_size=(8, 8), shuffle=False)
    xs_ref, ys_ref = _drain_loader(train)

    res = ResidentVideos.from_arai(str(tmp_path / "training"),
                                   downsample_size=(8, 8))
    assert res.n_windows == len(xs_ref)
    assert res.power == 1.0 and res.normalizing_max == 1.0
    x, y = _gather_kmni(res, np.asarray(res.starts))  # same (T,H,W,V) layout
    np.testing.assert_allclose(x, xs_ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y, ys_ref, rtol=0, atol=1e-6)
    # per-file start lists never span the file boundary (16-frame files,
    # 8-frame windows -> 9 starts each)
    assert [len(s) for s in res.file_starts] == [9, 9]


def test_arai_resident_skips_short_and_stray_files(tmp_path):
    """from_arai mirrors AraiLoader's file discipline: non-numeric names
    ignored, files shorter than one 2T window contribute nothing."""
    from extended_gan_tpu.data.io import save_array

    rng = np.random.RandomState(1)
    save_array(str(tmp_path / "0.pt"),
               rng.rand(12, 3, 1, 8, 8).astype(np.float32))
    save_array(str(tmp_path / "1.pt"),  # 5 frames < 8-frame window
               rng.rand(5, 3, 1, 8, 8).astype(np.float32))
    (tmp_path / "README.md").write_text("not data")
    res = ResidentVideos.from_arai(str(tmp_path), downsample_size=(8, 8))
    assert res.n_windows == 12 - 8 + 1
    assert len(res.file_starts) == 1
    assert np.asarray(res.video).shape == (12, 8, 8, 3)


def test_epoch_programs_shuffle_is_permutation(kmni_folder):
    mesh = MeshContext.create(data=8, model=1)
    res = ResidentVideos.from_kmni(kmni_folder + "/train", mesh, crop=8)
    k, b = 3, 8
    progs = res.epoch_programs(jax.random.PRNGKey(1), k, b, shuffle=True)
    flat = np.asarray(progs).ravel()
    valid = flat[flat >= 0]
    assert len(valid) == res.n_windows
    np.testing.assert_array_equal(np.sort(valid),
                                  np.sort(np.asarray(res.starts)))
    # padding only in the final program
    per = k * b
    n_pad = progs.shape[0] * per - res.n_windows
    assert (flat == -1).sum() == n_pad
    counts = res.program_sample_counts(progs.shape[0], k, b)
    assert sum(counts) == res.n_windows
    assert counts[-1] == per - n_pad


def test_gat_resident_megastep_matches_streaming_megastep(kmni_folder):
    """Same windows through (a) the streaming megastep with host-built
    batches and (b) the resident megastep with on-device gathers ->
    identical final params (shared step body; only the batch source
    differs)."""
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.gat_trainer import make_gat_megastep
    from extended_gan_tpu.train.optim import make_optimizer
    from extended_gan_tpu.train.state import create_net_state

    mesh = MeshContext.create(data=2, model=1)
    crop, k, b = 12, 2, 4
    res = ResidentVideos.from_kmni(kmni_folder + "/train", mesh, crop=crop)

    model = build_model("temporal", image_width=crop, image_height=crop,
                        n_vertices=6, mapping_type="linear")
    tx = make_optimizer("sgd", 1e-2)

    def fresh_state():
        s = create_net_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((2, crop, crop, 4, 6)))
        return mesh.put_replicated(s)

    progs = res.epoch_programs(jax.random.PRNGKey(7), k, b, shuffle=True)
    rngs = jax.random.split(jax.random.PRNGKey(9), progs.shape[0] * k)
    rngs = rngs.reshape(progs.shape[0], k, 2)

    # (a) resident path
    mega_res = make_gat_resident_megastep(model, tx, time_steps=4)
    s_res = fresh_state()
    for i in range(progs.shape[0]):
        s_res, logs_res = mega_res(s_res, res.video, progs[i], rngs[i])

    # (b) streaming-megastep path fed the SAME gathered windows
    mega_str = make_gat_megastep(model, tx)
    s_str = fresh_state()
    for i in range(progs.shape[0]):
        starts = np.asarray(progs[i])
        masks = (starts >= 0).astype(np.float32)
        xs = np.empty((k, b, crop, crop, 4, 6), np.float32)
        ys = np.empty_like(xs)
        for j in range(k):
            xs[j], ys[j] = _gather_kmni(res, np.maximum(starts[j], 0))
        xs_d, ys_d, ms_d = mesh.put_megabatch(xs, ys, masks)
        s_str, logs_str = mega_str(s_str, xs_d, ys_d, ms_d, rngs[i])

    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-5, atol=2e-6),
        s_res.params, s_str.params)
    np.testing.assert_allclose(np.asarray(logs_res["running_nd"]),
                               np.asarray(logs_str["running_nd"]),
                               rtol=2e-5)


@pytest.mark.slow
def test_dcgan_resident_megastep_runs_and_masks_tail(h5_folder):
    """The dcgan resident megastep executes on a DP mesh and the padded
    tail rows are masked out of the metric accumulators (mask sum ==
    valid sample count)."""
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan

    mesh = MeshContext.create(data=2, model=1)
    models, txs, states, _ = build_dcgan(dict(DEFAULT_PARAMS), seed=0)
    states = mesh.put_replicated(states)

    h5_folder64 = ensure_synthetic_h5(None, frames_train=40, frames_test=16,
                                      h=64, w=64)
    res = ResidentVideos.from_h5(h5_folder64 + "/train", mesh, crop=64)
    k, b = 2, 16
    progs = res.epoch_programs(jax.random.PRNGKey(3), k, b, shuffle=True)
    mega = make_dcgan_resident_megastep(*models, *txs)
    rngs = jax.random.split(jax.random.PRNGKey(11), k)
    total_valid = 0
    for i in range(progs.shape[0]):
        states, logs = mega(states, res.video, progs[i], rngs)
        total_valid += int(np.asarray(progs[i] >= 0).sum())
    assert total_valid == res.n_windows
    # metrics exist and are finite
    nd = np.asarray(logs["train_mse_nd"])
    assert np.isfinite(nd).all()
    for leaf in jax.tree_util.tree_leaves(states.g.params):
        assert np.isfinite(np.asarray(leaf)).all()


# ---------------------------------------------------------------- round 5


@pytest.fixture(scope="module")
def coastal_folder(tmp_path_factory):
    from extended_gan_tpu.data.synthetic import ensure_synthetic_coastal

    # 64x64: the dcgan-family FrameDiscriminator's stride-2/4 conv stack
    # collapses smaller frames to zero spatial extent
    return ensure_synthetic_coastal(
        str(tmp_path_factory.mktemp("coastal")), frames_per_file=20,
        h=64, w=64)


def test_coastal_resident_equals_streaming_unshuffled(coastal_folder):
    """from_pt_frames reproduces CoastalSeaLoader's window universe: NO
    truncation (every stride-1 window of the full file), crop, squeezed
    channel, never spanning files."""
    from extended_gan_tpu.data.streaming import CoastalSeaLoader

    train = CoastalSeaLoader(coastal_folder + "/train", 8, crop=64,
                             shuffle=False, seq_len=4)
    xs_ref, ys_ref = _drain_loader(train)
    xs_ref, ys_ref = xs_ref.squeeze(2), ys_ref.squeeze(2)  # (b, S, H, W)

    res = ResidentVideos.from_pt_frames(coastal_folder + "/train", crop=64,
                                        seq_len=4)
    assert res.n_windows == len(xs_ref)
    v = np.asarray(res.video)
    idx = np.asarray(res.starts)[:, None] + np.arange(8)
    wins = v[idx]  # (n, 8, H, W)
    np.testing.assert_allclose(wins[:, :4], xs_ref, atol=1e-6)
    np.testing.assert_allclose(wins[:, 4:], ys_ref, atol=1e-6)


def test_cyclegan_resident_megastep_matches_streaming(coastal_folder):
    """Same windows through the streaming CycleGAN megastep (host-built
    NHWC batches) and the resident megastep (on-device gathers) ->
    identical final params."""
    from extended_gan_tpu.data.resident import (
        make_cyclegan_resident_megastep,
    )
    from extended_gan_tpu.train.cyclegan_driver import build_cyclegan
    from extended_gan_tpu.train.cyclegan_trainer import (
        make_cyclegan_megastep,
    )

    mesh = MeshContext.create(data=2, model=1)
    _models = build_cyclegan(nc=4, ndf=8, imsize=64, seed=0)
    models, txs, states0, _, _, _ = _models
    res = ResidentVideos.from_pt_frames(coastal_folder + "/train", mesh,
                                        seq_len=4, crop=64)
    k, b = 2, 4
    progs = res.epoch_programs(jax.random.PRNGKey(5), k, b, shuffle=True)
    rngs = jax.random.split(jax.random.PRNGKey(6), progs.shape[0] * k)
    rngs = rngs.reshape(progs.shape[0], k, 2)

    def fresh_states():
        # deep-copy: the megasteps donate their state arg, and device_put
        # of an already-placed tree aliases the same buffers
        return mesh.put_replicated(
            jax.tree_util.tree_map(jnp.copy, states0))

    mega_res = make_cyclegan_resident_megastep(*models, *txs, seq_len=4)
    s_res = fresh_states()
    for i in range(progs.shape[0]):
        s_res, logs_res = mega_res(s_res, res.video, progs[i], rngs[i])

    v = np.asarray(res.video)
    mega_str = make_cyclegan_megastep(*models, *txs)
    s_str = fresh_states()
    for i in range(progs.shape[0]):
        starts = np.asarray(progs[i])
        masks = (starts >= 0).astype(np.float32)
        idx = np.maximum(starts, 0)[..., None] + np.arange(8)
        wins = np.moveaxis(v[idx], 2, -1)  # (k, b, H, W, 8)
        xs_d, ys_d, ms_d = mesh.put_megabatch(
            np.ascontiguousarray(wins[..., :4]),
            np.ascontiguousarray(wins[..., 4:]), masks)
        s_str, logs_str = mega_str(s_str, xs_d, ys_d, ms_d, rngs[i])

    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-5, atol=2e-6),
        s_res.g_xy.params, s_str.g_xy.params)
    np.testing.assert_allclose(np.asarray(logs_res["train_mse_nd"]),
                               np.asarray(logs_str["train_mse_nd"]),
                               rtol=2e-5)


def test_cyclegan_resident_eval_matches_streaming(coastal_folder):
    """resident_cyclegan_test == the driver's streaming eval loop on the
    same split: pure (num, denom) metrics, so agreement is numeric."""
    from extended_gan_tpu.data.resident import (
        make_cyclegan_resident_eval,
        resident_cyclegan_test,
    )
    from extended_gan_tpu.data.streaming import CoastalSeaLoader
    from extended_gan_tpu.train.cyclegan_driver import _feed, build_cyclegan
    from extended_gan_tpu.train.cyclegan_trainer import (
        make_cyclegan_eval_step,
    )
    from extended_gan_tpu.utils.metrics import IncrementalTuple

    mesh = MeshContext.create(data=2, model=1)
    models, _txs, states, _step, eval_step, _keys = build_cyclegan(
        nc=4, ndf=8, imsize=64, seed=2)
    states = mesh.put_replicated(states)

    b = 6
    loader = CoastalSeaLoader(coastal_folder + "/test", b, crop=64,
                              shuffle=False, seq_len=4)
    pred_ref, cyc_ref = IncrementalTuple(), IncrementalTuple()
    for x, y, mask in _feed(iter(loader), mesh, b):
        _, logs = eval_step(states, x, y, mask)
        logs = jax.device_get(logs)
        pred_ref += IncrementalTuple(logs["pred_mse_nd"])
        cyc_ref += IncrementalTuple(logs["cycle_l1_nd"])

    store = ResidentVideos.from_pt_frames(coastal_folder + "/test", mesh,
                                          seq_len=4, crop=64)
    eval_k = make_cyclegan_resident_eval(models[0], models[1], seq_len=4)
    got = resident_cyclegan_test(eval_k, states, store, k=3, batch_size=b)
    np.testing.assert_allclose(got["pred_mse"], pred_ref.item(), rtol=2e-5)
    np.testing.assert_allclose(got["cycle_l1"], cyc_ref.item(), rtol=2e-5)


def test_eval_programs_composition(kmni_folder):
    """eval_programs builds the streaming loaders' batch composition:
    consecutive per-file chunks, tails padded, <=1-sample batches
    dropped, fully-padded program tail rows."""
    res = ResidentVideos.from_kmni(kmni_folder + "/train", crop=8)
    b = 7
    progs, total = res.eval_programs(3, b)
    flat = np.asarray(progs).reshape(-1, b)
    # reconstruct expected batches host-side
    expected = []
    for fs in res.file_starts:
        for i in range(0, len(fs), b):
            chunk = fs[i:i + b]
            if len(chunk) <= 1:
                continue
            expected.append(chunk)
    assert total == sum(len(c) for c in expected)
    for row, chunk in zip(flat, expected):
        np.testing.assert_array_equal(row[:len(chunk)], chunk)
        assert (row[len(chunk):] == -1).all()
    for row in flat[len(expected):]:  # program-padding rows
        assert (row == -1).all()


def test_resident_eval_matches_streaming_test(kmni_folder):
    """resident_gat_test == gat_trainer.test on the same split: same
    val_loss/acc/prec/rec/denorm_mse, with the streaming loader SHUFFLED
    (batch composition is per-file in 'batch' mode, so within-batch and
    file-order shuffling cannot change the result)."""
    from extended_gan_tpu.data.resident import (
        make_gat_resident_eval,
        resident_gat_test,
    )
    from extended_gan_tpu.data.streaming import KmniLoader
    from extended_gan_tpu.models.registry import build_model
    from extended_gan_tpu.train.gat_trainer import (
        make_gat_eval_step,
        test as gat_test,
    )
    from extended_gan_tpu.train.optim import make_optimizer
    from extended_gan_tpu.train.state import create_net_state

    mesh = MeshContext.create(data=2, model=1)
    crop, b = 12, 8
    model = build_model("temporal", image_width=crop, image_height=crop,
                        n_vertices=6, mapping_type="linear")
    tx = make_optimizer("sgd", 1e-2)
    state = mesh.put_replicated(create_net_state(
        model, tx, jax.random.PRNGKey(2),
        jnp.zeros((2, crop, crop, 4, 6))))

    loader = KmniLoader(b, kmni_folder + "/train", crop=crop, shuffle=True,
                        seed=11)
    ref = gat_test(make_gat_eval_step(model), state, loader, mesh)

    store = ResidentVideos.from_kmni(kmni_folder + "/train", mesh,
                                     crop=crop)
    eval_k = make_gat_resident_eval(model, time_steps=4,
                                    power=store.power,
                                    normalizing_max=store.normalizing_max)
    got = resident_gat_test(eval_k, state, store, k=3, batch_size=b)
    assert set(got) == set(ref)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=2e-5,
                                   atol=1e-7, err_msg=key)


@pytest.mark.slow
def test_dcgan_resident_eval_matches_streaming_test(h5_folder):
    """resident_dcgan_test == dcgan_trainer.test on the same split: the
    disc-accuracy denominators count BATCHES, so composition parity
    (min_batch=1, program-padding batches zeroed) is part of the
    contract."""
    from extended_gan_tpu.data.resident import (
        make_dcgan_resident_eval,
        resident_dcgan_test,
    )
    from extended_gan_tpu.data.streaming import H5SequenceLoader
    from extended_gan_tpu.train.dcgan_driver import DEFAULT_PARAMS, build_dcgan
    from extended_gan_tpu.train.dcgan_trainer import (
        make_dcgan_eval_step,
        test as dcgan_test,
    )

    mesh = MeshContext.create(data=2, model=1)
    params = dict(DEFAULT_PARAMS)
    models, _txs, states, _ = build_dcgan(params, seed=1)
    states = mesh.put_replicated(states)

    folder = ensure_synthetic_h5(None, frames_train=56, frames_test=24,
                                 h=64, w=64)
    b = 6
    loader = H5SequenceLoader(folder + "/train", b, crop=64, shuffle=False)
    ref = dcgan_test(loader, states, make_dcgan_eval_step(*models), mesh,
                     b, epoch=0, img_path=None)

    store = ResidentVideos.from_h5(folder + "/train", mesh, crop=64)
    eval_k = make_dcgan_resident_eval(*models)
    got = resident_dcgan_test(eval_k, states, store, k=3, batch_size=b)
    assert set(got) == set(ref)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=2e-5,
                                   atol=1e-7, err_msg=key)
