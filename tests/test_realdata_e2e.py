"""Recorded-stream ingestion exercised end-to-end (VERDICT missing #7).

Synthesizes a Prophesee-Gen3-like recording — 640×480 sensor, nanosecond
UNIX-epoch timestamps, {0,1} polarity encoding, events from a moving
high-contrast edge — and drives BOTH real-data consumers:

1. offline training path: package_real_sequence → h5 (reference schema) →
   dataloader (resize/rescale) → a short Learner fine-tune,
2. online deployment path: the 30 Hz uint8 accumulator (evfly_ros
   node.cpp semantics) → (u8-128)·0.2 → center crop 260×346, checked
   against the voxelizer's count frame for the same window.
"""

import numpy as np
import pytest

from evfly_tpu.data.dataloading import write_h5_dataset
from evfly_tpu.data.realdata import package_real_sequence, sync_depth_events


def _synth_prophesee_recording(rng, n_frames=14, H=480, W=640, fps=30.0):
    """Moving vertical edge: events where the edge crosses pixels, depth from
    edge distance.  Timestamps ns since epoch, polarity {0,1}."""
    t0_ns = 1_700_000_000_000_000_000  # realistic UNIX-epoch ns offset
    depth_ts = t0_ns + (np.arange(n_frames) / fps * 1e9).astype(np.int64)

    ts, xs, ys, ps = [], [], [], []
    edge0, speed = 40.0, 480.0  # px, px/s
    for i in range(1, n_frames):
        ta, tb = depth_ts[i - 1], depth_ts[i]
        e_a = edge0 + speed * (ta - t0_ns) / 1e9
        e_b = edge0 + speed * (tb - t0_ns) / 1e9
        cols = np.arange(int(e_a), min(int(e_b) + 1, W))
        for c in cols:
            rows = rng.choice(H, size=160, replace=False)
            tt = ta + ((c - e_a) / max(e_b - e_a, 1e-9)) * (tb - ta)
            ts.extend([tt] * len(rows))
            xs.extend([c] * len(rows))
            ys.extend(rows.tolist())
            ps.extend(rng.integers(0, 2, size=len(rows)).tolist())
    order = np.argsort(ts)
    events = (
        np.asarray(ts, np.float64)[order],
        np.asarray(xs, np.int32)[order],
        np.asarray(ys, np.int32)[order],
        np.asarray(ps, np.int8)[order],
    )

    yy, xx = np.mgrid[0:H, 0:W]
    depths = np.stack([
        np.clip(np.abs(xx - (edge0 + speed * (t - t0_ns) / 1e9)) / W, 0, 1).astype(np.float32)
        for t in depth_ts
    ])
    return events, depths, depth_ts.astype(np.float64)


def test_timestamp_rebase_and_polarity_mapping():
    rng = np.random.default_rng(0)
    (et, ex, ey, ep), depths, dts = _synth_prophesee_recording(rng, n_frames=6)
    traj = package_real_sequence("real_000", et, ex, ey, ep, depths, dts)
    # epoch-scale ns timestamps survived the float32 device cast: every
    # window produced events (without rebasing, all frames collapse)
    assert traj["evs"].shape[0] == len(depths) - 1
    nonzero_frames = (np.abs(traj["evs"]).sum(axis=(1, 2)) > 0).sum()
    assert nonzero_frames == len(depths) - 1
    # {0,1} polarity became signed counts: both polarities present
    assert traj["evs"].max() > 0 and traj["evs"].min() < 0
    # meta timestamps rebased to the trajectory start
    assert traj["data"][0, 1] == 0.0
    assert traj["data"][-1, 1] == pytest.approx(dts[-1] - dts[0])


@pytest.mark.slow
def test_real_recording_to_training(tmp_path):
    rng = np.random.default_rng(1)
    trajs = []
    for i in range(2):
        (et, ex, ey, ep), depths, dts = _synth_prophesee_recording(rng, n_frames=12)
        trajs.append(package_real_sequence(f"real_{i:03d}", et, ex, ey, ep, depths, dts))
    path = str(tmp_path / "realset")
    write_h5_dataset(path + ".h5", trajs)

    from test_learner import _base_config
    from evfly_tpu.train.learner import Learner

    cfg = _base_config(
        tmp_path, path, N_eps=2, data_augmentation=0.0, seed=5,
        resize_input=[260, 346], batch_size=6, val_split=0.5,
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
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_accumulator_matches_voxelizer_window():
    """Deployment path: uint8 accumulation + (u8-128)·0.2 equals the
    voxelizer's threshold-count frame for the same events."""
    from evfly_tpu.stream.accumulator import EventAccumulator, frame_from_accumulated

    rng = np.random.default_rng(2)
    H, W = 480, 640
    n = 20000
    x = rng.integers(0, W, n).astype(np.int32)
    y = rng.integers(0, H, n).astype(np.int32)
    p01 = rng.integers(0, 2, n).astype(np.int8)
    signed = (p01.astype(np.int32) * 2 - 1).astype(np.int8)

    acc = EventAccumulator(H, W)
    acc.accumulate(x, y, signed)
    frame = frame_from_accumulated(acc.drain(), crop_hw=(H, W))  # counts × 0.2

    ref = np.zeros((H, W), np.float32)
    np.add.at(ref, (y, x), signed.astype(np.float32) * 0.2)
    ref = np.clip(ref, (0 - 128) * 0.2, (255 - 128) * 0.2)
    np.testing.assert_allclose(frame, ref, atol=1e-6)
