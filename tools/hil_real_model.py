"""HIL episode with the REAL trained model (VERDICT r2 item #5).

The reference's deployment test flies the actual network on the vehicle
(/root/reference/evfly_ros/run.py:250-309,366-414); the round-2 HIL harness
(stream/hil.py) only ever flew a ScriptedPipeline.  This tool closes that
gap: one `run_hil_episode` with

  * a trained `StreamingPipeline` (joint OrigUNet+ViTLSTM checkpoint —
    the same jitted step the deployment runner ships),
  * a renderer-backed event sensor: intensity difflog between successive
    `render_depth_intensity` frames, quantized at the ±0.2 contrast
    threshold into discrete (x, y, p) bursts — exactly what a camera
    driver would hand the native accumulator,
  * the native C++ flight stack executing the guarded commands.

Reports tracking metrics (forward progress, altitude hold, minimum
obstacle clearance from the 100 Hz fine trajectory) and per-tick model
latency (p50/p95, true device sync per tick).

  python tools/hil_real_model.py --ckpt <joint.pth> --out-json /tmp/hil.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from train_policy import ENC, FC  # the shipped joint-model config


def make_render_sensor(centers, radii, thresh: float = 0.2, eps: float = 1e-5,
                       is_trees: bool = True):
    """Renderer-backed event camera: difflog between successive intensity
    renders at the vehicle position, quantized into per-pixel event counts
    (ops/voxelizer.difflog_events semantics, run_competition.py:603-635),
    then expanded to discrete (x, y, p) bursts."""
    from evfly_tpu.sim.render import render_depth_intensity

    centers = jnp.asarray(centers, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    prev = {"int": None}

    @jax.jit
    def _render(pos):
        _, inten = render_depth_intensity(pos, centers, radii, is_trees=is_trees)
        return inten

    def sensor(pos, t):
        inten = np.asarray(_render(jnp.asarray(pos, jnp.float32)))
        if prev["int"] is None:
            prev["int"] = inten
            return np.array([], np.int32), np.array([], np.int32), np.array([], np.int32)
        difflog = np.log(inten + eps) - np.log(prev["int"] + eps)
        prev["int"] = inten
        counts = np.floor(np.abs(difflog) / thresh).astype(np.int32)
        if np.abs(difflog).max() < thresh:
            counts[:] = 0
        sign = np.sign(difflog).astype(np.int32)
        yy, xx = np.nonzero(counts)
        if len(xx) == 0:
            return np.array([], np.int32), np.array([], np.int32), np.array([], np.int32)
        rep = counts[yy, xx]
        return (
            np.repeat(xx.astype(np.int32), rep),
            np.repeat(yy.astype(np.int32), rep),
            np.repeat(sign[yy, xx], rep),
        )

    return sensor


class TimedPipeline:
    """Wraps StreamingPipeline.step_frame with a true-sync latency probe
    (np.asarray forces the device transfer — on the axon tunnel that is the
    only real synchronization point, CLAUDE.md)."""

    def __init__(self, inner):
        self.inner = inner
        self.input_hw = inner.input_hw
        self.lat = []

    def step_frame(self, frame):
        t0 = time.perf_counter()
        vel, depth = self.inner.step_frame(frame)
        vel = np.asarray(vel)
        self.lat.append(time.perf_counter() - t0)
        return vel, depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--desvel", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--obstacles", type=int, default=30)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--pilot", action="store_true",
                    help="fly the full pilot episode: arm -> takeoff -> "
                         "run -> land (sim/pilot.py state machine)")
    args = ap.parse_args()

    from evfly_tpu.models import port
    from evfly_tpu.models.composites import OrigUNet_w_VITFLY_ViTLSTM
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.sim import generate_forest
    from evfly_tpu.stream.hil import run_hil_episode
    from evfly_tpu.stream.pipeline import StreamingPipeline

    set_precision("default")
    model = OrigUNet_w_VITFLY_ViTLSTM(
        num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
        enc_params=ENC, fc_params=FC, input_shape=[1, 1, 260, 346],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )
    params = model.init(jax.random.PRNGKey(0))
    params = port.load_into(params, port.load_state_dict(args.ckpt))
    pipe = TimedPipeline(StreamingPipeline(model, params, desvel=args.desvel))

    rng = np.random.default_rng(args.seed)
    field = generate_forest(rng, num_obstacles=args.obstacles, trees=True)
    K = 48
    centers = np.full((K, 3), 1e6, np.float32)
    radii = np.zeros(K, np.float32)
    centers[: len(field)] = field.positions
    radii[: len(field)] = field.radii
    sensor = make_render_sensor(centers, radii)

    res = run_hil_episode(
        pipe, sensor, duration=args.duration, des_fwd_vel=args.desvel,
        start_pos=(0.0, 0.0, 0.0) if args.pilot else (0.0, 0.0, 2.0),
        use_pilot=args.pilot,
    )

    # pilot episodes: altitude-hold is only meaningful in the run phase
    # (takeoff/landing legs intentionally change altitude)
    fine = res.fine
    if args.pilot:
        t0, t1 = res.phases["run"]
        fine = fine[(fine[:, 0] >= t0) & (fine[:, 0] <= t1)]

    # minimum horizontal clearance to any tree along the 100 Hz trajectory
    fine_xy = res.fine[:, 1:3]                      # (N, 2) x,y
    act = radii > 0
    d = np.linalg.norm(
        fine_xy[:, None, :] - centers[None, act, :2], axis=-1
    ) - radii[None, act]
    min_clear = float(d.min()) if act.any() else float("inf")

    lat = np.asarray(pipe.lat[1:])  # drop the compile tick
    report = {
        "ckpt": args.ckpt,
        "duration_s": args.duration,
        "final_x_m": float(res.pos[-1, 0]),
        "mean_fwd_vel_mps": float(np.mean(res.vel[:, 0])),
        "alt_rms_about_setpoint_m": float(
            np.sqrt(np.mean((fine[:, 3] - 2.0) ** 2))
        ),
        "min_obstacle_clearance_m": min_clear,
        "collided": bool(min_clear < 0.0),
        "guard_stopped": bool(res.guard_stopped),
        "ticks": int(len(res.t)),
        "tick_latency_ms_p50": float(np.percentile(lat, 50) * 1e3),
        "tick_latency_ms_p95": float(np.percentile(lat, 95) * 1e3),
        "compile_tick_ms": float(pipe.lat[0] * 1e3),
    }
    if args.pilot:
        report["pilot_transitions"] = [
            [float(t), m_from, m_to] for t, m_from, m_to in res.transitions
        ]
        report["pilot_phases"] = {
            k: [float(a), float(b)] for k, (a, b) in res.phases.items()
        }
    print(json.dumps(report, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
