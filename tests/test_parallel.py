"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_and_batch_sharding():
    from evfly_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(8)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    shard_list = sharded["x"].addressable_shards
    assert len(shard_list) == 8
    assert shard_list[0].data.shape == (2, 1)


@pytest.mark.slow
def test_dp_train_step_runs_and_matches_single_device():
    """The 8-way DP step must produce the same loss as single-device."""
    from evfly_tpu.parallel.data_parallel import dp_train_demo_step

    loss8, values8, gn8 = dp_train_demo_step(8, batch=8)
    loss1, values1, gn1 = dp_train_demo_step(1, batch=8)
    assert np.isfinite(loss8) and np.isfinite(gn8)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-4)
    np.testing.assert_allclose(gn8, gn1, rtol=1e-3)


def test_graft_entry_importable():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    assert callable(fn) and len(args) == 4
