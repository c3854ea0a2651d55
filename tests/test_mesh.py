import jax
import jax.numpy as jnp
import numpy as np

from extended_gan_tpu.parallel import MeshContext, local_batch_size


def test_mesh_creation_8_devices():
    ctx = MeshContext.create()
    assert ctx.n_devices == 8
    assert ctx.n_data == 8
    assert ctx.n_model == 1


def test_mesh_2d():
    ctx = MeshContext.create(data=4, model=2)
    assert ctx.n_data == 4 and ctx.n_model == 2


def test_put_batch_shards_leading_axis():
    ctx = MeshContext.create()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xd = ctx.put_batch(x)
    assert xd.sharding.is_equivalent_to(ctx.batch_sharding, ndim=2)
    # each device holds 16/8 = 2 rows
    shard = xd.addressable_shards[0]
    assert shard.data.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(xd), x)


def test_sharded_computation_matches_replicated():
    ctx = MeshContext.create()
    x = np.random.RandomState(0).randn(16, 8).astype(np.float32)
    xd = ctx.put_batch(x)

    @jax.jit
    def f(a):
        return jnp.sum(a * a, axis=1)

    np.testing.assert_allclose(np.asarray(f(xd)), np.asarray(f(x)), rtol=1e-6)


def test_pad_to_batch_multiple():
    ctx = MeshContext.create()
    x = np.ones((5, 2), np.float32)
    xp, mask = ctx.pad_to_batch_multiple(x, batch_size=8)
    assert xp.shape == (8, 2)
    assert mask.sum() == 5
    assert (xp[5:] == 0).all()


def test_local_batch_size():
    ctx = MeshContext.create()
    assert local_batch_size(32, ctx) == 4


def test_hybrid_mesh_axes_and_batch_sharding():
    from extended_gan_tpu.parallel import MeshContext

    ctx = MeshContext.create_hybrid(dcn=2, data=2, model=2)
    assert ctx.mesh.axis_names == ("dcn", "data", "model")
    assert (ctx.n_dcn, ctx.n_data, ctx.n_model) == (2, 2, 2)
    assert ctx.dp_size == 4
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    xd = ctx.put_batch(x)
    # batch shards jointly over dcn x data: 4 distinct shards of 2 rows
    assert len({s.device for s in xd.addressable_shards}) == 8
    assert xd.addressable_shards[0].data.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(xd), x)


def test_hybrid_padded_batch_uses_dp_degree():
    from extended_gan_tpu.parallel import MeshContext, local_batch_size

    ctx = MeshContext.create_hybrid(dcn=2, data=4, model=1)
    assert ctx.dp_size == 8
    assert ctx.padded_batch_size(9) == 16
    assert local_batch_size(16, ctx) == 2


def test_hybrid_mesh_rejects_zero_data_axis():
    import pytest

    from extended_gan_tpu.parallel import MeshContext

    # 8 devices cannot host dcn=8 x model=2: data would round to 0
    with pytest.raises(ValueError, match="devices"):
        MeshContext.create_hybrid(dcn=8, model=2)


def test_initialize_distributed_reinit_is_benign(monkeypatch):
    """jax 0.9's double-init message ('should only be called once') must be
    swallowed — round-2 review: the old match string was dead code."""
    import jax

    from extended_gan_tpu.parallel.mesh import initialize_distributed

    def raise_once(**kwargs):
        raise RuntimeError("distributed.initialize should only be called once.")

    monkeypatch.setattr(jax.distributed, "initialize", raise_once)
    initialize_distributed()  # must not raise


def test_initialize_distributed_raises_under_launcher_env(monkeypatch):
    """A partially-configured multi-process launch (SLURM here) must raise,
    not silently fall back to N independent single-process trainings."""
    import jax
    import pytest

    from extended_gan_tpu.parallel.mesh import initialize_distributed

    def fail(**kwargs):
        raise ValueError("Number of processes must be defined.")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    monkeypatch.setenv("SLURM_NTASKS", "4")
    with pytest.raises(ValueError, match="processes"):
        initialize_distributed()
    monkeypatch.setenv("SLURM_NTASKS", "1")
    initialize_distributed()  # bare single-process: benign


def test_hybrid_mesh_rejects_unbalanced_slices():
    """With spare capacity the hybrid mesh must draw devices from every
    slice — and refuse when some slice can't supply its share."""
    import pytest

    from extended_gan_tpu.parallel import MeshContext

    class FakeDev:
        def __init__(self, slice_index):
            self.slice_index = slice_index
            self.process_index = slice_index

    # 7 devices in slice 0, 1 in slice 1: dcn=2 x (data=1 x model=2)
    # needs 2 per slice; slice 1 has only 1 -> must raise, not silently
    # build a "dcn" axis living entirely inside slice 0
    devs = [FakeDev(0)] * 7 + [FakeDev(1)]
    with pytest.raises(ValueError, match="slice sizes"):
        MeshContext.create_hybrid(dcn=2, data=1, model=2, devices=devs)
