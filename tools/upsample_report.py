"""Quantify flow-upsampled event generation against high-rate ground truth.

The reference raises the camera rate with SuperSloMo before esim_torch
(/root/reference/utils/to_events.py:146-200) so event timestamps resolve
motion finer than the camera.  The TPU-native analog warps frames along the
renderer's exact optical flow (ops/upsample.py).  Because the scene is
analytic we can render the TRUE intermediate frames — the ground truth
Vid2E never has — and measure, on one forest trajectory:

* frame-domain: warped intermediates vs true renders, against the no-warp
  cross-fade baseline;
* event-domain at fine granularity: ESIM on the upsampled sequence vs ESIM
  on the true high-rate sequence, against the linear-in-log interpolation
  the plain ESIM scan assumes.  (Summed back to camera-rate windows every
  scheme telescopes to the same signed frames — the gain is sub-window
  timing, which is what discrete event lists and faster-than-camera event
  windows consume.)

Usage: python tools/upsample_report.py [--out-json artifacts/upsample_report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--frames", type=int, default=45, help="base-rate frames")
    ap.add_argument("--factor", type=int, default=4, help="ground-truth rate multiple")
    ap.add_argument("--fps", type=float, default=15.0)
    ap.add_argument("--velx", type=float, default=3.0)
    ap.add_argument("--vely", type=float, default=1.0, help="lateral dodge component")
    ap.add_argument("--thresh", type=float, default=0.2)
    ap.add_argument("--hw", type=int, nargs=2, default=[130, 173])
    args = ap.parse_args()

    from evfly_tpu.ops.esim import esim_event_frames
    from evfly_tpu.ops.upsample import (
        adaptive_factor,
        linear_log_upsample,
        upsample_sequence,
    )
    from evfly_tpu.sim import generate_forest
    from evfly_tpu.sim.batched import pad_fields
    from evfly_tpu.sim.render import render_rgbd_flow

    rng = np.random.default_rng(args.seed)
    field = generate_forest(rng, num_obstacles=30, trees=True)
    centers, radii = pad_fields([field], K_min=48)
    centers, radii = centers[0], radii[0]
    H, W = args.hw
    vel = np.array([args.velx, args.vely, 0.0], np.float32)
    lw = np.array([0.299, 0.587, 0.114], np.float32)

    render = jax.jit(
        lambda p: render_rgbd_flow(
            p, jnp.asarray(vel), jnp.zeros(3), centers, radii,
            H=H, W=W, is_trees=True,
        )
    )

    T, K, dt = args.frames, args.factor, 1.0 / args.fps
    frames_hi, flows_hi = [], []
    for i in range(T * K + 1):
        rgb, _, flow = render(jnp.asarray([0.0, 0.0, 2.0] + vel * (i * dt / K), jnp.float32))
        frames_hi.append(np.asarray(rgb) @ lw)
        flows_hi.append(np.asarray(flow))
    frames_hi = np.stack(frames_hi)
    frames = frames_hi[::K]
    flows = np.stack(flows_hi[::K])

    ts = np.arange(len(frames)) * dt
    up, _ = upsample_sequence(frames, flows, ts, fixed_factor=K)

    # ---- frame domain ----
    warp_err = fade_err = 0.0
    n = 0
    for i in range(len(frames_hi)):
        if i % K == 0:
            continue
        a = (i % K) / K
        j = i // K
        fade = (1 - a) * frames[j] + a * frames[j + 1]
        warp_err += float(np.mean(np.abs(up[i] - frames_hi[i])))
        fade_err += float(np.mean(np.abs(fade - frames_hi[i])))
        n += 1
    warp_err /= n
    fade_err /= n

    # ---- event domain (fine windows) ----
    th = args.thresh
    truth_fine = np.asarray(esim_event_frames(jnp.asarray(frames_hi), th, th))
    up_fine = np.asarray(esim_event_frames(jnp.asarray(up), th, th))
    lin_fine = np.asarray(
        esim_event_frames(jnp.asarray(linear_log_upsample(frames, K)), th, th)
    )

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            # both empty -> perfect agreement; one empty -> total miss
            return 1.0 if na == nb else 0.0
        return float((a * b).sum() / (na * nb))

    cos_up = np.mean([cos(up_fine[i].ravel(), truth_fine[i].ravel()) for i in range(len(truth_fine))])
    cos_lin = np.mean([cos(lin_fine[i].ravel(), truth_fine[i].ravel()) for i in range(len(truth_fine))])

    factors = [
        adaptive_factor(flows[i], flows[i + 1], dt) for i in range(len(frames) - 1)
    ]
    report = {
        "base_frames": T,
        "gt_rate_multiple": K,
        "hw": [H, W],
        "vel": [float(v) for v in vel],
        "threshold": th,
        "frame_mae_flow_warp": warp_err,
        "frame_mae_crossfade": fade_err,
        "frame_mae_ratio": warp_err / fade_err,
        "fine_event_l1_flow_warp": float(np.abs(up_fine - truth_fine).sum()),
        "fine_event_l1_linear_in_log": float(np.abs(lin_fine - truth_fine).sum()),
        "fine_event_l1_ratio": float(
            np.abs(up_fine - truth_fine).sum() / np.abs(lin_fine - truth_fine).sum()
        ),
        "fine_event_cosine_flow_warp": float(cos_up),
        "fine_event_cosine_linear_in_log": float(cos_lin),
        "adaptive_factor_p50_p95_max": [
            float(np.percentile(factors, 50)),
            float(np.percentile(factors, 95)),
            float(np.max(factors)),
        ],
    }
    print(json.dumps(report, indent=2))
    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
