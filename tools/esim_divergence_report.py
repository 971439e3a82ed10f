"""Quantify the ESIM-vs-difflog event-statistics gap on one sim trajectory.

VERDICT r4 next #8: the dataset-generation path here uses linear-in-log
ESIM (ops/esim.py, carried reference) where the reference uses
SuperSloMo+esim_torch (utils/to_events.py:146-244, external CUDA); the sim
runtime path uses difflog (run_competition.py:603-635), which is rebuilt
EXACTLY (ops/voxelizer.difflog_events, oracle-tested).  This tool flies one
rendered trajectory and reports the per-pixel count-distribution gap
between the two event generators at identical thresholds, so the documented
divergence has numbers.

Interpretation guide: difflog re-quantizes every frame pair independently
and zeroes sub-threshold windows; ESIM integrates residuals across windows
(each crossing emitted exactly once).  On slow ramps difflog UNDERCOUNTS
(residual < threshold discarded every window) while ESIM accumulates —
that is the designed difference, not an error.

Usage: python tools/esim_divergence_report.py [--out-json artifacts/esim_divergence.json]
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
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--vel", type=float, default=4.0)
    ap.add_argument("--thresh", type=float, default=0.2)
    args = ap.parse_args()

    from evfly_tpu.ops.esim import esim_event_frames
    from evfly_tpu.ops.voxelizer import difflog_events
    from evfly_tpu.sim import generate_forest
    from evfly_tpu.sim.render import render_depth_intensity

    rng = np.random.default_rng(args.seed)
    field = generate_forest(rng, num_obstacles=30, trees=True)
    K = 48
    centers = np.full((K, 3), 1e6, np.float32)
    radii = np.zeros(K, np.float32)
    centers[: len(field)] = field.positions
    radii[: len(field)] = field.radii
    centers_j = jnp.asarray(centers)
    radii_j = jnp.asarray(radii)

    render = jax.jit(
        lambda p: render_depth_intensity(p, centers_j, radii_j, is_trees=True)[1]
    )

    # straight 4 m/s flight at 2 m altitude — the eval trajectory shape
    T = args.frames
    dt = 1.0 / args.fps
    frames = np.stack([
        np.asarray(render(jnp.asarray([args.vel * dt * i, 0.0, 2.0], jnp.float32)))
        for i in range(T)
    ])

    th = args.thresh
    esim = np.asarray(esim_event_frames(jnp.asarray(frames), th, th))
    dlog = np.stack([
        np.asarray(difflog_events(jnp.asarray(frames[i + 1]), jnp.asarray(frames[i]), th, th))
        for i in range(T - 1)
    ])

    # signed threshold counts
    ce = np.rint(esim / th).astype(np.int64)
    cd = np.rint(dlog / th).astype(np.int64)

    flat_e, flat_d = ce.ravel(), cd.ravel()
    denom = max(np.abs(flat_d).sum(), 1)

    def cos(a, b):
        na, nb = np.linalg.norm(a.astype(np.float64)), np.linalg.norm(b.astype(np.float64))
        if na == 0 or nb == 0:
            return 1.0 if na == nb else 0.0
        return float((a.astype(np.float64) * b).sum() / (na * nb))

    per_window_cos = np.array([
        cos(ce[i].ravel(), cd[i].ravel()) for i in range(T - 1)
    ])
    diff = np.abs(flat_e - flat_d)
    active = (flat_e != 0) | (flat_d != 0)

    report = {
        "frames": T,
        "hw": list(frames.shape[1:]),
        "threshold": th,
        "total_count_ratio_esim_over_difflog": float(
            np.abs(flat_e).sum() / denom
        ),
        "active_pixel_fraction_esim": float((flat_e != 0).mean()),
        "active_pixel_fraction_difflog": float((flat_d != 0).mean()),
        "per_pixel_count_mean_abs_esim": float(np.abs(flat_e).mean()),
        "per_pixel_count_mean_abs_difflog": float(np.abs(flat_d).mean()),
        "count_quantiles_esim_p50_p95_p99_max": [
            float(q) for q in np.percentile(np.abs(flat_e[flat_e != 0]), [50, 95, 99])
        ] + [float(np.abs(flat_e).max())],
        "count_quantiles_difflog_p50_p95_p99_max": [
            float(q) for q in np.percentile(np.abs(flat_d[flat_d != 0]), [50, 95, 99])
        ] + [float(np.abs(flat_d).max())],
        "disagreeing_active_pixel_fraction": float(
            (diff[active] > 0).mean()
        ),
        "mean_abs_count_diff_on_active": float(diff[active].mean()),
        "max_abs_count_diff": int(diff.max()),
        "per_window_cosine_mean": float(per_window_cos.mean()),
        "per_window_cosine_min": float(per_window_cos.min()),
        "pearson_r_per_pixel_counts": float(
            np.corrcoef(flat_e, flat_d)[0, 1]
        ),
    }
    print(json.dumps(report, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
