"""Scanned per-trajectory training (one dispatch per trajectory) must compute
exactly what the per-chunk path computes (stepfn.make_scanned_traj_step)."""

import numpy as np
import pytest

from evfly_tpu.data.dataloading import write_h5_dataset
from evfly_tpu.train.learner import Learner

from test_learner import _base_config, _toy_dataset  # noqa: F401


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mixed_length_dataset(tmp_path, rng, lengths=(19, 10, 26), H=60, W=90):
    """Unequal trajectory lengths: shorter trajectories exercise the scanned
    path's n_valid==0 chunk skipping (lax.cond branch)."""
    trajs = []
    for i, T in enumerate(lengths):
        meta = np.zeros((T, 21), np.float32)
        meta[:, 0] = np.arange(T)
        meta[:, 1] = np.arange(T) * 0.03
        meta[:, 2] = 4.0
        meta[:, 13] = 4.0
        meta[:, 14] = rng.standard_normal(T) * 0.3
        trajs.append({
            "name": f"traj_{i:03d}", "data": meta,
            "ims": rng.random((T, H, W)).astype(np.float32),
            "depths": rng.random((T, H, W)).astype(np.float32),
            "desvel": meta[:, 2],
            "evs": (rng.standard_normal((T - 1, H, W)) * 0.4).astype(np.float32),
        })
    path = str(tmp_path / "toy_mixed")
    write_h5_dataset(path + ".h5", trajs)
    return path


def _train(tmp_path, data_path, traj_scan, sub, epoch_scan=False):
    # VITFLY_ConvNet: dropout-free, so the two paths' different rng-split
    # sequences cannot perturb the math being compared
    cfg = _base_config(
        tmp_path, data_path, ws_suffix=f"_{sub}", traj_scan=traj_scan,
        epoch_scan=epoch_scan,
        N_eps=2, data_augmentation=0.0, seed=5, model_type=["VITFLY_ConvNet"],
    )
    learner = Learner(cfg)
    losses = []
    orig = learner.mylogger

    def capture(msg):
        orig(msg)
        if "ep_loss =" in msg:
            losses.append(float(msg.split("ep_loss = ")[1].split(",")[0]))

    learner.mylogger = capture
    learner.train_loop()
    return learner, losses


def test_scanned_epochs_match_per_chunk(tmp_path, rng):
    data_path = _mixed_length_dataset(tmp_path, rng)

    ls, losses_s = _train(tmp_path, data_path, traj_scan=True, sub="scan")
    lc, losses_c = _train(tmp_path, data_path, traj_scan=False, sub="chunk")

    assert len(losses_s) == len(losses_c) == 2
    np.testing.assert_allclose(losses_s, losses_c, rtol=2e-4)
    # scan vs inline chunk loops fuse differently in XLA; tiny f32 reduction
    # deltas pass through Adam's rsqrt — observed max 1e-4 over 2 epochs
    for k in ls.params:
        np.testing.assert_allclose(
            np.asarray(ls.params[k]), np.asarray(lc.params[k]), atol=5e-4, err_msg=k
        )


def test_epoch_scan_matches_per_chunk(tmp_path, rng):
    """Whole-epoch-on-device path (incl. the on-device LR schedule) computes
    what the per-chunk host loop computes."""
    data_path = _mixed_length_dataset(tmp_path, rng, lengths=(17, 9, 25))

    le, losses_e = _train(tmp_path, data_path, traj_scan=False, epoch_scan=True, sub="ep")
    lc, losses_c = _train(tmp_path, data_path, traj_scan=False, sub="chunk2")

    assert len(losses_e) == len(losses_c) == 2
    np.testing.assert_allclose(losses_e, losses_c, rtol=2e-4)
    for k in le.params:
        np.testing.assert_allclose(
            np.asarray(le.params[k]), np.asarray(lc.params[k]), atol=5e-4, err_msg=k
        )


def test_epoch_scan_grouped_matches_whole(tmp_path, rng):
    """Grouped epoch scan (cfg.scan_group: bounded-runtime dispatches with
    padded trailing groups) computes exactly what the single-dispatch epoch
    scan computes — same per-trajectory rng keys, same its counters."""
    data_path = _mixed_length_dataset(tmp_path, rng, lengths=(17, 9, 25))

    def run(scan_group, sub):
        cfg = _base_config(
            tmp_path, data_path, ws_suffix=f"_{sub}", traj_scan=False,
            epoch_scan=True, scan_group=scan_group, N_eps=2,
            data_augmentation=0.0, seed=5, model_type=["VITFLY_ConvNet"],
            lr_warmup_epochs=1,
        )
        learner = Learner(cfg)
        learner.train_loop()
        return learner

    lg = run(2, "grp")   # 3 trajs in groups of 2: last group padded
    lw = run(0, "whole")
    for k in lg.params:
        np.testing.assert_allclose(
            np.asarray(lg.params[k]), np.asarray(lw.params[k]), atol=5e-4, err_msg=k
        )


def test_group_rows_padding():
    """Learner._group_rows: trailing-group padding repeats the slice's first
    index row with n_valid zeroed (device cond-skips it) and repeats the last
    row of companion arrays; full groups pass through unpadded."""
    T, C, G = 5, 3, 4
    idxs = {
        "start": np.arange(T * C, dtype=np.int32).reshape(T, C),
        "ev_start": np.arange(T * C, dtype=np.int32).reshape(T, C) + 100,
        "n_valid": np.ones((T, C), np.int32),
    }
    rngs = np.arange(T * 2, dtype=np.uint32).reshape(T, 2)

    sl, (rngs_g,), n = Learner._group_rows(idxs, [rngs], 0, 4, G)
    assert n == 4
    for k in idxs:
        np.testing.assert_array_equal(sl[k], idxs[k][:4])
    np.testing.assert_array_equal(rngs_g, rngs[:4])

    # trailing group: rows [4:5) padded to G=4
    sl, (rngs_g,), n = Learner._group_rows(idxs, [rngs], 4, 5, G)
    assert n == 1
    assert sl["start"].shape == (G, C) and rngs_g.shape == (G, 2)
    np.testing.assert_array_equal(sl["start"], np.repeat(idxs["start"][4:5], G, 0))
    np.testing.assert_array_equal(sl["n_valid"][0], idxs["n_valid"][4])
    assert (sl["n_valid"][1:] == 0).all()          # padded rows skipped on device
    np.testing.assert_array_equal(rngs_g, np.repeat(rngs[4:5], G, 0))
    assert (idxs["n_valid"] == 1).all()            # caller's arrays untouched


def test_epoch_scan_with_warmup_lr(tmp_path, rng):
    """On-device LR schedule: warmup active (lr_warmup_epochs=1) — both
    paths must still agree (the schedule is evaluated per trajectory)."""
    data_path = _mixed_length_dataset(tmp_path, rng, lengths=(17, 9))

    def run(epoch_scan, sub):
        cfg = _base_config(
            tmp_path, data_path, ws_suffix=f"_{sub}", traj_scan=False,
            epoch_scan=epoch_scan, N_eps=3, data_augmentation=0.0, seed=5,
            model_type=["VITFLY_ConvNet"], lr_warmup_epochs=1,
        )
        learner = Learner(cfg)
        learner.train_loop()
        return learner

    le = run(True, "wlre")
    lc = run(False, "wlrc")
    for k in le.params:
        np.testing.assert_allclose(
            np.asarray(le.params[k]), np.asarray(lc.params[k]), atol=5e-4, err_msg=k
        )
