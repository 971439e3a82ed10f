"""Learner end-to-end smoke tests on a synthetic h5 dataset (small model)."""

import glob
import os

import numpy as np
import pytest

from evfly_tpu.configs import EvflyConfig
from evfly_tpu.data.dataloading import write_h5_dataset
from evfly_tpu.train.learner import Learner


def _toy_dataset(tmp_path, rng, n_traj=4, T=12, H=60, W=90):
    trajs = []
    for i in range(n_traj):
        meta = np.zeros((T, 21), np.float32)
        meta[:, 0] = np.arange(T)
        meta[:, 1] = np.arange(T) * 0.03
        meta[:, 2] = 4.0
        meta[:, 13] = 4.0  # forward velocity commands
        meta[:, 14] = rng.standard_normal(T) * 0.3
        trajs.append(
            {
                "name": f"traj_{i:03d}",
                "data": meta,
                "ims": rng.random((T, H, W)).astype(np.float32),
                "depths": rng.random((T, H, W)).astype(np.float32),
                "desvel": meta[:, 2],
                "evs": (rng.standard_normal((T - 1, H, W)) * 0.4).astype(np.float32),
            }
        )
    path = str(tmp_path / "toy")
    write_h5_dataset(path + ".h5", trajs)
    return path


def _base_config(tmp_path, data_path, **over):
    kw = dict(
        basedir=str(tmp_path),
        logdir="logs",
        datadir=str(tmp_path),
        dataset=[data_path],
        use_h5=True,
        events="evs_frames",
        keep_collisions=True,
        seed=-2,
        val_split=0.5,
        batch_size=8,
        model_type=["VITFLY_LSTMNet"],
        num_in_channels=2,
        num_out_channels=1,
        N_eps=2,
        lr=1e-3,
        lr_warmup_epochs=0,
        save_model_freq=1,
        val_freq=1,
        loss_weights=[10.0, 1.0],
        optional_loss_param=[5.0, -1.0],
        rescale_evs=-1.0,
        print_trainprogress_freq=1,
    )
    kw.update(over)
    return EvflyConfig(**kw)


@pytest.mark.slow
def test_learner_trains_and_checkpoints(tmp_path, rng):
    data_path = _toy_dataset(tmp_path, rng)
    cfg = _base_config(tmp_path, data_path)
    learner = Learner(cfg)
    assert learner.num_training_steps == 2 and learner.num_val_steps == 2

    # loss decreases over a few epochs on the tiny problem
    (l0, _), _ = learner.run_model(
        0, learner.train.traj_starts, learner.train.trajlength,
        np.arange(2), "val", batch_size=8, do_step=False,
    )
    learner.train_loop()
    (l1, _), _ = learner.run_model(
        0, learner.train.traj_starts, learner.train.trajlength,
        np.arange(2), "train", batch_size=8, do_step=False,
    )
    assert np.isfinite(l1)

    ws = learner.workspace
    assert os.path.exists(os.path.join(ws, "train_val_dirs.npy"))
    assert os.path.exists(os.path.join(ws, "args.txt"))
    assert os.path.exists(os.path.join(ws, "log.txt"))
    # periodic checkpoints named model_ep{ep:06d}.pth
    assert glob.glob(os.path.join(ws, "model_ep*.pth"))
    # per-term best checkpoints exist and old bests were deleted (≤1 per type)
    for pat in ("model_best_ep*.pth", "model_best0_ep*.pth", "model_best1_ep*.pth"):
        assert len(glob.glob(os.path.join(ws, pat))) <= 1
    assert glob.glob(os.path.join(ws, "model_best*_ep*.pth"))


@pytest.mark.slow
def test_learner_checkpoint_resume_and_trainval_restore(tmp_path, rng):
    data_path = _toy_dataset(tmp_path, rng)
    cfg = _base_config(tmp_path, data_path, seed=5, N_eps=1)
    learner = Learner(cfg)
    learner.train_loop()
    ckpts = sorted(glob.glob(os.path.join(learner.workspace, "model_ep*.pth")))
    dirs_before = list(learner.train.dirs)

    cfg2 = _base_config(
        tmp_path, data_path, seed=5, N_eps=1,
        checkpoint_path=[ckpts[-1]], load_trainval=True,
    )
    learner2 = Learner(cfg2)
    assert learner2.train.dirs == dirs_before  # split restored from npy
    assert learner2.num_eps_trained == int(os.path.basename(ckpts[-1])[-10:-4])
