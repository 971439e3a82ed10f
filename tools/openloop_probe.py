"""Open-loop dodge probe (CPU-only JAX — safe next to a live chip trainer).

Decides whether the closed-loop "no dodge" failure (artifacts/eval_joint.json:
every trial finishes at commanded speed, mean 2.9 crashes, near-constant vy)
is a COVARIATE-SHIFT problem or a MODEL problem:

* feed the trained checkpoint the exact deployment input path
  (stream.pipeline._quantile_scale -> composite forward, carried hidden) but
  on frames from EXPERT trajectories (the training distribution);
* if predicted vy tracks the expert's vy here, the model has learned the
  dodge mapping and the closed-loop failure is distribution shift -> DAgger
  is the right lever (reference analog: evfly pretrains V(phi) on huge
  off-policy data for the same reason);
* if predicted vy is flat even here, the model ignores the events for vy and
  more epochs / DAgger cannot fix it.

Also reports the chunk-reset (training-semantics) variant to separate any
carried-hidden-state horizon effect, and depth-prediction quality (is D(theta)
good enough for V(phi) to see obstacles).

Usage:
  nice -n 19 python tools/openloop_probe.py --ckpt artifacts/joint_final.pth \
      --h5 .data/evfly/data/datasets/simgen_forest_big.h5 --trajs 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # env var is too late (sitecustomize)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import h5py
import jax.numpy as jnp
import numpy as np


def build(ckpt, kind="joint"):
    from evfly_tpu.models import port
    from evfly_tpu.models.composites import OrigUNet_w_VITFLY_ViTLSTM
    from evfly_tpu.models.vitfly import LSTMNetVIT
    from evfly_tpu.ops.imageops import set_precision

    set_precision("default")
    if kind == "vit_depth":
        # V(phi)-only probe: the pretrain_v stage (ViTLSTM on GT depth through
        # the clip(2*depth,0,1) hand-off transform, learner_models.py:634).
        # If THIS tracks vy while the joint model does not, the dodge failure
        # is localized to D(theta)'s predicted-depth quality.
        model = LSTMNetVIT()
        params = model.init(jax.random.PRNGKey(0))
        params = port.load_into(params, port.load_state_dict(ckpt))
        return model, params
    ENC = {
        "num_layers": 2, "kernel_sizes": [5, 3], "kernel_strides": [2, 2],
        "out_channels": [8, 32], "activations": ["relu", "relu"],
        "pool_type": "max", "invert_pool_inputs": True,
        "pool_kernels": [2, 2], "pool_strides": [2, 2], "conv_function": "conv2d",
    }
    FC = {
        "num_layers": 4, "layer_sizes": [1024, 128, 16, 1],
        "activations": ["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
        "dropout_p": 0.1,
    }
    model = OrigUNet_w_VITFLY_ViTLSTM(
        num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
        enc_params=ENC, fc_params=FC, input_shape=[1, 1, 260, 346],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )
    params = model.init(jax.random.PRNGKey(0))
    params = port.load_into(params, port.load_state_dict(ckpt))
    return model, params


def run_traj(model, params, evs, desvel, reset_every=None, kind="joint"):
    """Sequential forward over a trajectory's frames.

    reset_every=None -> carried hidden (deployment, run.py:259-262);
    reset_every=k    -> zero hidden every k frames (training chunk semantics).
    """
    from evfly_tpu.stream.pipeline import _quantile_scale

    if kind == "vit_depth":

        @jax.jit
        def step(params, frame, dv, hidden):
            x = jnp.clip(frame * 2.0, 0.0, 1.0).reshape(1, 1, *frame.shape)
            vel, new_hidden, _ = model.apply(
                params, [x, dv.reshape(1, 1), None, hidden], train=False
            )
            return vel[0], jnp.zeros(()), new_hidden

        def init_hidden():
            return (jnp.zeros((3, 128)), jnp.zeros((3, 128)))

    else:

        @jax.jit
        def step(params, frame, dv, hidden):
            frame = _quantile_scale(frame)
            x = frame.reshape(1, 1, *frame.shape)
            vel, (depth, _up, new_hidden), _ = model.apply(
                params, [x, dv.reshape(1, 1), hidden[0], hidden[1]], train=False
            )
            return vel[0], depth[0, 0], new_hidden

        init_hidden = model.init_hidden

    hidden = init_hidden()
    vels, depths = [], []
    for i in range(evs.shape[0]):
        if reset_every is not None and i % reset_every == 0:
            hidden = init_hidden()
        v, d, hidden = step(params, jnp.asarray(evs[i]), jnp.asarray(desvel[i]), hidden)
        vels.append(np.asarray(v))
        depths.append(np.asarray(d))
    return np.stack(vels), np.stack(depths)


def stats(pred_vel, gt_vel, desvel):
    """pred_vel is normalized (model output); gt normalized by desvel."""
    gt = gt_vel / desvel[:, None]
    p, g = pred_vel[:, 1], gt[:, 1]
    act = np.abs(g) > 0.05  # frames where the expert actually dodges
    out = {
        "frames": int(len(g)),
        "frames_active": int(act.sum()),
        "corr_vy": float(np.corrcoef(p, g)[0, 1]) if np.std(p) > 1e-8 else 0.0,
        "mean_abs_vy_pred": float(np.abs(p).mean()),
        "mean_abs_vy_gt": float(np.abs(g).mean()),
        "p95_abs_vy_pred": float(np.percentile(np.abs(p), 95)),
        "p95_abs_vy_gt": float(np.percentile(np.abs(g), 95)),
        "sign_agree_active": float((np.sign(p[act]) == np.sign(g[act])).mean()) if act.any() else None,
        "mean_abs_vx_err": float(np.abs(pred_vel[:, 0] - gt[:, 0]).mean()),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--h5", required=True)
    ap.add_argument("--trajs", type=int, default=2)
    ap.add_argument("--max-frames", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--kind", choices=["joint", "vit_depth"], default="joint")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    model, params = build(args.ckpt, args.kind)

    reports = []
    with h5py.File(args.h5, "r") as f:
        keys = sorted(f.keys())
        # probe the LAST trajectories: with seed-7 val-fraction split these
        # are most likely val; either way expert-distribution inputs
        for k in keys[-args.trajs:]:
            g = f[k]
            data = np.asarray(g["data"])
            depths = np.asarray(g["depths"], np.float32)
            desvel = np.asarray(g["desvel"], np.float32)
            if args.kind == "vit_depth":
                # depth[i] pairs with meta row i, ids = 1..T-1 (learner.py)
                n = min(args.max_frames, depths.shape[0] - 1)
                frames = depths[1 : n + 1]
                gt_vel = data[1 : n + 1, 13:16].astype(np.float32)
                dv = desvel[1 : n + 1]
                gt_depth = frames
            else:
                # evs[i] pairs with meta row i+1 (learner.py ids = 1..T-1)
                frames = np.asarray(g["evs"], np.float32)[: args.max_frames]
                gt_vel = data[1 : frames.shape[0] + 1, 13:16].astype(np.float32)
                dv = desvel[1 : frames.shape[0] + 1]
                gt_depth = depths[1 : frames.shape[0] + 1]

            t0 = time.time()
            pv_carried, pd_carried = run_traj(model, params, frames, dv, kind=args.kind)
            pv_chunk, _ = run_traj(model, params, frames, dv, reset_every=args.chunk, kind=args.kind)
            dt = time.time() - t0
            rep = {
                "traj": k,
                "carried": stats(pv_carried, gt_vel, dv),
                "chunk_reset": stats(pv_chunk, gt_vel, dv),
                "depth_mae": (
                    float(np.abs(pd_carried - gt_depth).mean())
                    if pd_carried.ndim == gt_depth.ndim else None
                ),
                "gt_depth_mean": float(gt_depth.mean()),
                "sec": round(dt, 1),
            }
            reports.append(rep)
            print(json.dumps(rep, indent=2), flush=True)

    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump({"ckpt": args.ckpt, "h5": args.h5, "trajs": reports}, fh, indent=2)


if __name__ == "__main__":
    main()
