"""Real-data packaging: sync + voxelize + spoofed telemetry."""

import numpy as np
import pytest

from evfly_tpu.data.realdata import package_real_sequence, sync_depth_events


def test_sync_windows():
    depth_ts = np.array([0.0, 0.1, 0.2, 0.2, 0.3])  # one duplicate timestamp
    event_t = np.linspace(0.0, 0.3, 100)
    pairs = sync_depth_events(depth_ts, event_t)
    assert [p[0] for p in pairs] == [1, 2, 4]  # duplicate window dropped
    assert pairs[0][1:] == (0.0, 0.1)


def test_package_real_sequence(rng):
    H, W = 24, 32
    T = 5
    depth_ts = np.arange(T) * 0.1
    depth = rng.random((T, H, W)).astype(np.float32)
    n_ev = 2000
    ev_t = np.sort(rng.uniform(0, depth_ts[-1], n_ev)).astype(np.float32)
    ev_x = rng.uniform(0, W, n_ev).astype(np.float32)
    ev_y = rng.uniform(0, H, n_ev).astype(np.float32)
    # all-positive polarity so net-count conservation holds (mixed polarities
    # cancel per pixel within a window by design)
    ev_p = np.ones(n_ev, np.int32)

    traj = package_real_sequence(
        "real_000", ev_t, ev_x, ev_y, ev_p, depth, depth_ts, desired_vel=4.0
    )
    assert traj["depths"].shape == (T, H, W)
    assert traj["evs"].shape == (T - 1, H, W)
    meta = traj["data"]
    assert meta.shape == (T, 21)
    np.testing.assert_allclose(meta[:, 2], 4.0)       # desired vel
    np.testing.assert_allclose(meta[:, 3], 1.0)       # identity quat w
    np.testing.assert_allclose(meta[:, 13:16], 0.0)   # spoofed velcmd
    # events conserved: every in-range event lands in some window
    total_ev_mass = np.abs(traj["evs"]).sum() / 0.2
    in_range = (ev_t >= depth_ts[0]) & (ev_t < depth_ts[-1])
    assert total_ev_mass == pytest.approx(in_range.sum(), rel=0.01)


def test_package_roundtrips_through_dataloader(tmp_path, rng):
    from evfly_tpu.data.dataloading import dataloader, write_h5_dataset

    H, W = 16, 20
    T = 4
    depth_ts = np.arange(T) * 0.1
    depth = rng.random((T, H, W)).astype(np.float32)
    ev_t = np.sort(rng.uniform(0, 0.3, 500)).astype(np.float32)
    traj = package_real_sequence(
        "real_000", ev_t,
        rng.uniform(0, W, 500).astype(np.float32),
        rng.uniform(0, H, 500).astype(np.float32),
        rng.choice([-1, 1], 500).astype(np.int32),
        depth, depth_ts,
    )
    path = str(tmp_path / "real_forest-a")
    write_h5_dataset(path + ".h5", [traj])
    train, _, _ = dataloader(
        path, val_split=0.0, seed=-2, events="evs_frames.npy",
        keep_collisions=True, rescale_evs=-1.0, evs_min_cutoff=0.15,
        logger=lambda m: None,
    )
    assert len(train) == 1
    assert train.evs[0].shape == (T - 1, H, W)
