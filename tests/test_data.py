"""Dataloader parity tests on synthetic h5 datasets."""

import numpy as np
import pytest

from evfly_tpu.data.dataloading import dataloader, write_h5_dataset


def _make_traj(rng, name, T=20, H=24, W=32, collide=False):
    meta = np.zeros((T, 21), np.float32)
    meta[:, 0] = np.arange(T)
    meta[:, 1] = np.arange(T) * 0.03
    meta[:, 2] = 4.0  # desired vel
    meta[:, 13:16] = rng.standard_normal((T, 3))
    if collide:
        meta[T // 2, -1] = 1.0
    return {
        "name": name,
        "data": meta,
        "ims": rng.random((T, H, W)).astype(np.float32),
        "depths": rng.random((T, H, W)).astype(np.float32),
        "desvel": meta[:, 2],
        "evs": (rng.standard_normal((T - 1, H, W)) * 0.4).astype(np.float32),
    }


@pytest.fixture
def h5_dataset(tmp_path, rng):
    trajs = [_make_traj(rng, f"traj_{i:03d}", T=15 + i) for i in range(6)]
    trajs[2]["data"][3, -1] = 1.0  # collision trajectory
    path = str(tmp_path / "toy_forest")
    write_h5_dataset(path + ".h5", trajs)
    return path, trajs


def test_split_and_shapes(h5_dataset):
    path, trajs = h5_dataset
    train, val, is_png = dataloader(
        path, val_split=0.3, seed=-2, events="evs_frames.npy",
        keep_collisions=True, logger=lambda m: None,
    )
    assert is_png
    assert len(train) + len(val) == 6
    assert len(train) == int(0.7 * 6)
    assert train.ims.shape[0] == sum(train.trajlength)
    assert train.velcmd.shape == (train.ims.shape[0], 3)
    # seed=-2: no shuffle, order preserved
    assert train.dirs[0].endswith("traj_000")
    # evs are per-trajectory lists of length T-1
    assert train.evs[0].shape[0] == train.trajlength[0] - 1


def test_collision_filtering(h5_dataset):
    path, _ = h5_dataset
    train, val, _ = dataloader(
        path, val_split=0.0, seed=-2, events="evs_frames.npy",
        keep_collisions=False, logger=lambda m: None,
    )
    assert len(train) == 5  # traj_002 dropped


def test_seeded_shuffle_reproducible(h5_dataset):
    path, _ = h5_dataset
    tr1, _, _ = dataloader(path, val_split=0.3, seed=7, events="", logger=lambda m: None)
    tr2, _, _ = dataloader(path, val_split=0.3, seed=7, events="", logger=lambda m: None)
    assert tr1.dirs == tr2.dirs
    tr3, _, _ = dataloader(path, val_split=0.3, seed=8, events="", logger=lambda m: None)
    assert tr1.dirs != tr3.dirs  # different seed, different order


def test_percentile_rescale_matches_torch_quantile(h5_dataset):
    import torch

    path, trajs = h5_dataset
    train, _, _ = dataloader(
        path, val_split=0.0, seed=-2, events="evs_frames.npy",
        keep_collisions=True, rescale_evs=-1.0, logger=lambda m: None,
    )
    raw = trajs[0]["evs"]
    ref = torch.from_numpy(raw)
    maxvals = torch.quantile(torch.abs(ref).view(ref.shape[0], -1), 0.97, dim=1)
    expected = torch.clamp(ref / maxvals.view(-1, 1, 1), -1.0, 1.0).numpy()
    np.testing.assert_allclose(train.evs[0], expected, atol=1e-5)


def test_resize_input(h5_dataset):
    path, _ = h5_dataset
    train, _, _ = dataloader(
        path, val_split=0.0, seed=-2, events="evs_frames.npy",
        keep_collisions=True, resize_input=[12, 16], logger=lambda m: None,
    )
    assert train.ims.shape[1:] == (12, 16)
    assert train.depths.shape[1:] == (12, 16)
    assert train.evs[0].shape[1:] == (12, 16)


def test_train_val_dirs_restore(h5_dataset):
    path, _ = h5_dataset
    tr, va, _ = dataloader(path, val_split=0.5, seed=3, events="", logger=lambda m: None)
    tvd = (tr.dirs, va.dirs, tr.dirs_ids, va.dirs_ids)
    tr2, va2, _ = dataloader(path, val_split=0.0, seed=-2, events="", train_val_dirs=tvd, logger=lambda m: None)
    assert tr2.dirs == tr.dirs
    assert va2.dirs == va.dirs


def test_evs_min_cutoff(h5_dataset):
    path, _ = h5_dataset
    train, _, _ = dataloader(
        path, val_split=0.0, seed=-2, events="evs_frames.npy",
        keep_collisions=True, rescale_evs=-1.0, evs_min_cutoff=0.15,
        logger=lambda m: None,
    )
    for ev in train.evs:
        nz = ev[ev != 0]
        assert (np.abs(nz) >= 0.15).all()
