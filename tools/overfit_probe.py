"""Single-trajectory overfit probe (CPU-only JAX — chip-safe).

If the training path is sound, a 3.5M-param ViTLSTM MUST be able to memorize
one trajectory's depth->velocity mapping (vel MSE << the constant-output
floor, and per-frame vy predictions that track the expert's).  If it cannot,
the failure seen in every round (near-constant lateral output) is a framework
bug, not a data problem.

Uses the exact training building blocks (stepfn.make_train_step with the
pipeline's loss knobs) on frames from one h5 trajectory.

  nice -n 19 python tools/overfit_probe.py \
      --h5 .data/evfly/data/datasets/simgen_forest_big.h5 --steps 150
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import h5py
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5", required=True)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--traj-idx", type=int, default=-1)
    args = ap.parse_args()

    from evfly_tpu.models.vitfly import LSTMNetVIT
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.train.stepfn import make_train_step

    set_precision("default")

    with h5py.File(args.h5, "r") as f:
        keys = sorted(f.keys())
        g = f[keys[args.traj_idx]]
        data = np.asarray(g["data"])
        depths = np.asarray(g["depths"], np.float32)
        desvel = np.asarray(g["desvel"], np.float32)
    n = min(args.frames, depths.shape[0] - 1)
    frames = depths[1 : n + 1][:, None]          # (N,1,H,W), pretrain_v input
    gt_vel = data[1 : n + 1, 13:16].astype(np.float32)
    dv = desvel[1 : n + 1][:, None]
    nvy = gt_vel[:, 1] / dv[:, 0]
    floor = float(np.mean((gt_vel / dv - np.array([1.0, 0.0, 0.0])) ** 2))
    print(f"[OVERFIT] {n} frames, gt |vy|/desvel mean {np.abs(nvy).mean():.4f}, "
          f"constant-(1,0,0) floor MSE {floor:.5f}", flush=True)

    model = LSTMNetVIT()
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    # pretrain_v loss knobs (tools/train_policy.py::cmd_pretrain_v)
    step = make_train_step(
        model, "vitfly", opt, loss_weights=[1.0, 0.0],
        optional_loss_param=[5.0, 0.0], data_augmentation=False,
        num_out_channels=1, input_frame_scale=2.0,
    )
    step = jax.jit(step)

    B = args.chunk
    chunks = [(i, min(i + B, n)) for i in range(0, n, B)]
    rng = jax.random.PRNGKey(1)
    hist = []
    for s in range(args.steps):
        lo, hi = chunks[s % len(chunks)]
        m = hi - lo
        pad = B - m
        batch = {
            "input": jnp.asarray(np.pad(frames[lo:hi], ((0, pad), (0, 0), (0, 0), (0, 0)))),
            "desvel": jnp.asarray(np.pad(dv[lo:hi], ((0, pad), (0, 0)), constant_values=1.0)),
            "gt_vel": jnp.asarray(np.pad(gt_vel[lo:hi], ((0, pad), (0, 0)))),
            "gt_frames": jnp.zeros((B, 1) + frames.shape[2:], jnp.float32),
            "mask": jnp.asarray((np.arange(B) < m).astype(np.float32)),
        }
        rng, k = jax.random.split(rng)
        params, opt_state, loss, values, gradnorm = step(params, opt_state, batch, k)
        if s % 10 == 0 or s == args.steps - 1:
            hist.append((s, float(values[0]), float(gradnorm)))
            print(f"[OVERFIT] step {s:4d} vel_mse {float(values[0]):.5f} "
                  f"gradnorm {float(gradnorm):.3f}", flush=True)

    # final open-loop check on the SAME frames (train=False)
    from evfly_tpu.train.stepfn import apply_for_loss

    vel, _, _ = apply_for_loss(
        model, "vitfly", params,
        jnp.clip(jnp.asarray(frames) * 2.0, 0.0, 1.0), jnp.asarray(dv), False, None,
    )
    vel = np.asarray(vel)
    p = vel[:, 1]
    out = {
        "floor_mse": floor,
        "final_vel_mse": hist[-1][1],
        "pred_vy_std": float(p.std()),
        "corr_vy": float(np.corrcoef(p, nvy)[0, 1]) if p.std() > 1e-8 else 0.0,
        "overfit_ok": bool(hist[-1][1] < 0.5 * floor),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
