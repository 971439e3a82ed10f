"""recording_to_gif (the rosbag-free generic_bag_to_gif counterpart)."""

import os

import numpy as np
import pytest

from evfly_tpu.data.dataloading import write_h5_dataset
from evfly_tpu.utils.recording_to_gif import frames_to_gif, recording_to_gif


def test_frames_to_gif_events_and_gray(tmp_path):
    rng = np.random.default_rng(0)
    evs = (rng.integers(-3, 4, size=(5, 20, 30)) * 0.2).astype(np.float32)
    out = frames_to_gif(evs, str(tmp_path / "e.gif"), fps=10, is_events=True,
                        save_ims=str(tmp_path / "ims"))
    assert os.path.getsize(out) > 0
    assert len(os.listdir(tmp_path / "ims")) == 5
    gray = rng.random((4, 20, 30)).astype(np.float32)
    out = frames_to_gif(gray, str(tmp_path / "g.gif"), fps=10)
    assert os.path.getsize(out) > 0


def test_recording_to_gif_h5_and_npy(tmp_path):
    rng = np.random.default_rng(1)
    T, H, W = 6, 16, 22
    meta = np.zeros((T, 21), np.float32)
    meta[:, 1] = np.arange(T) * 0.06
    traj = {
        "name": "t0", "data": meta,
        "ims": rng.random((T, H, W)).astype(np.float32),
        "depths": rng.random((T, H, W)).astype(np.float32),
        "desvel": np.full(T, 4.0, np.float32),
        "evs": (rng.integers(-2, 3, (T - 1, H, W)) * 0.2).astype(np.float32),
    }
    h5 = str(tmp_path / "rec.h5")
    write_h5_dataset(h5, [traj])
    out = recording_to_gif(h5, str(tmp_path / "rec.gif"), channel="evs")
    assert os.path.getsize(out) > 0

    npy = str(tmp_path / "stack.npy")
    np.save(npy, traj["evs"])
    out = recording_to_gif(npy, str(tmp_path / "stack.gif"))
    assert os.path.getsize(out) > 0
