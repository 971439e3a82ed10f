"""Scaled expert data generation via lockstep batched rollouts (real TPU).

Generates N expert trials in batches of G (one vmapped render+difflog
dispatch per sensor tick for the whole batch — sim/batched.py) and packages
them into the reference h5 trajectory schema.  Replaces the round-1
one-trial-at-a-time path (~6 min/trial of per-frame RPC) with
TPU-throughput-bound batch rendering.

  python tools/datagen.py --out /data/evfly --trials 120 --batch 24 \
      --name simgen_forest_big [--mode state|planner] [--append]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from os.path import join as opj

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def generate(
    out_h5: str,
    n_trials: int,
    batch: int,
    mode: str = "state",
    seed: int = 0,
    policy_every: int = 6,
    command_every: int = 3,
    desvel_range=(3.0, 5.0),
    num_obstacles_range=(25, 41),
    obstacle_pad: int = 48,
    min_frames: int = 30,
    trees: bool = True,
    record_flow: bool = False,
):
    from evfly_tpu.data.dataloading import write_h5_dataset
    from evfly_tpu.sim import generate_forest, rollout_to_trajectory
    from evfly_tpu.sim.batched import run_trials_batched

    if record_flow:
        import functools

        import jax.numpy as jnp

        from evfly_tpu.sim.render import render_rgbd_flow

        @functools.lru_cache(maxsize=4)
        def _flow_fn(H, W):
            # obstacle arrays are ARGUMENTS (fixed obstacle_pad shape), so one
            # compile serves every trajectory's field instead of one per traj
            return jax.jit(
                jax.vmap(
                    lambda p, v, c, r: render_rgbd_flow(
                        p, v, jnp.zeros(3), c, r, H=H, W=W, is_trees=trees,
                    )[2],
                    in_axes=(0, 0, None, None),
                )
            )

        def traj_flows(traj, field):
            """Per-frame exact optical flow for a kept trajectory — rendered
            post-hoc from the logged camera states (data.csv layout: pos at
            cols 7-9, vel at 10-12) and the trial's obstacle field.  The
            analytic camera is axis-aligned and the velocity-tracking quad
            carries no attitude, so omega=0."""
            from evfly_tpu.sim.batched import pad_fields

            H, W = traj["ims"].shape[1:]
            centers, radii = pad_fields([field], K_min=obstacle_pad)
            centers, radii = centers[0], radii[0]
            meta = np.asarray(traj["data"], np.float32)
            T = len(meta)
            pad = (-T) % 64  # fixed 64-frame chunks: one compile, no
            # ragged-tail shape (trimmed after)
            if pad:
                meta = np.concatenate([meta, np.repeat(meta[-1:], pad, axis=0)])
            fn = _flow_fn(H, W)
            out = []
            for s in range(0, len(meta), 64):  # chunk to bound device memory
                out.append(np.asarray(fn(
                    jnp.asarray(meta[s: s + 64, 7:10]),
                    jnp.asarray(meta[s: s + 64, 10:13]),
                    centers, radii,
                )))
            return np.concatenate(out)[:T].astype(np.float16)

    rng = np.random.default_rng(seed)
    trajs = []
    n_done = 0
    t_start = time.time()
    while n_done < n_trials:
        G = min(batch, n_trials - n_done)
        fields = [
            generate_forest(
                rng, num_obstacles=int(rng.integers(*num_obstacles_range)), trees=trees
            )
            for _ in range(G)
        ]
        desvels = rng.uniform(*desvel_range, size=G)
        t0 = time.time()
        results = run_trials_batched(
            fields, mode=mode, desired_vels=desvels, policy_every=policy_every,
            command_every=command_every, max_steps=7000,
            seed=seed + 131 * n_done, obstacle_pad=obstacle_pad,
        )
        dt = time.time() - t0
        n_ok = 0
        for i, res in enumerate(results):
            s = res["summary"]
            ok = s.get("Success", False)
            n_ok += int(bool(ok))
            if len(res["depths"]) > min_frames:
                traj = rollout_to_trajectory(res, f"rollout_{mode}_{n_done + i:04d}")
                if record_flow:
                    traj["flows"] = traj_flows(traj, fields[i])
                trajs.append(traj)
        print(
            f"[DATAGEN] batch of {G} in {dt:.1f}s ({dt/G:.1f}s/trial): "
            f"{n_ok}/{G} success, kept {len(trajs)} total",
            flush=True,
        )
        n_done += G

    os.makedirs(os.path.dirname(out_h5), exist_ok=True)
    write_h5_dataset(out_h5, trajs)
    n_frames = sum(len(t["ims"]) for t in trajs)
    print(
        f"[DATAGEN] wrote {len(trajs)} trajectories / {n_frames} frames to {out_h5} "
        f"in {(time.time() - t_start)/60:.1f} min",
        flush=True,
    )
    return out_h5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=os.environ.get("EVFLY_OUT", "/root/repo/.data/evfly"))
    ap.add_argument("--name", type=str, default="simgen_forest_big")
    ap.add_argument("--trials", type=int, default=120)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--mode", type=str, default="state", choices=["state", "planner"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--policy-every", type=int, default=6)
    ap.add_argument(
        "--record-flow", action="store_true",
        help="store per-frame exact optical flow (f16) in the h5 for "
        "flow-upsampled event generation (to_events --scheme esim_flow); "
        "roughly doubles the dataset size",
    )
    args = ap.parse_args()

    out_h5 = opj(args.out, "data/datasets", f"{args.name}.h5")
    generate(
        out_h5, args.trials, args.batch, mode=args.mode, seed=args.seed,
        policy_every=args.policy_every, record_flow=args.record_flow,
    )


if __name__ == "__main__":
    main()
