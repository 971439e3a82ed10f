"""Label-distribution diagnostic for expert datasets (numpy/h5py only — no
JAX import, safe to run while a training process holds the chip).

The round-4 MV protocol eval showed the cloned policy completing the course
at commanded speed with near-constant lateral output (eval_joint.json: every
trial 16.63 s, mean 2.9 crashes).  Whether that is a DATA problem (the
expert's lateral commands are too rare/small to learn from) or a TRAINING
problem (underfit / covariate shift) is decided by the label distribution the
dataset actually carries — this prints it.

Columns follow the 21-col reference data.csv layout (SURVEY §2: desvel at 2,
velcmd x/y/z at 13:16, is_collide at 20).
"""

from __future__ import annotations

import argparse
import json
import sys

import h5py
import numpy as np


def analyze(path: str) -> dict:
    vy_all, vz_all, vx_all, desvel_all = [], [], [], []
    n_traj = n_collide = 0
    with h5py.File(path, "r") as f:
        for k in f.keys():
            g = f[k]
            data = np.asarray(g["data"])
            n_traj += 1
            if data[:, -1].any():
                n_collide += 1
                continue  # dataloader drops these (keep_collisions=False)
            vx_all.append(data[:, 13])
            vy_all.append(data[:, 14])
            vz_all.append(data[:, 15])
            desvel_all.append(data[:, 2])
    vx = np.concatenate(vx_all)
    vy = np.concatenate(vy_all)
    vz = np.concatenate(vz_all)
    dv = np.concatenate(desvel_all)
    nvy = np.abs(vy) / np.maximum(dv, 1e-6)  # desvel-normalized (the training target)
    frac = lambda t: float((nvy > t).mean())
    return {
        "dataset": path,
        "trajs_kept": n_traj - n_collide,
        "trajs_collide_dropped": n_collide,
        "frames": int(vy.size),
        "vx_over_desvel_mean": float((vx / np.maximum(dv, 1e-6)).mean()),
        "abs_vy_mean": float(np.abs(vy).mean()),
        "abs_vy_p50": float(np.percentile(np.abs(vy), 50)),
        "abs_vy_p95": float(np.percentile(np.abs(vy), 95)),
        "abs_vy_max": float(np.abs(vy).max()),
        "norm_vy_frac_gt_0.05": frac(0.05),
        "norm_vy_frac_gt_0.1": frac(0.1),
        "norm_vy_frac_gt_0.25": frac(0.25),
        "abs_vz_mean": float(np.abs(vz).mean()),
        "vy_exactly_zero_frac": float((vy == 0.0).mean()),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("h5", nargs="+")
    args = ap.parse_args()
    for p in args.h5:
        try:
            print(json.dumps(analyze(p), indent=2))
        except Exception as e:
            print(f"{p}: {e!r}", file=sys.stderr)
