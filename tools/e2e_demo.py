"""End-to-end demo on real hardware: sim data → joint training → vision eval.

The minimum-slice-through-everything run (SURVEY.md §7.3 extended to
BASELINE config 5): expert rollouts in the ROS-free sim generate an h5
dataset with difflog event frames; the joint OrigUNet+ViTLSTM trains on it
through the Learner (two-term weighted loss, velocity + depth); the trained
checkpoint then flies vision-mode closed-loop trials through the streaming
pipeline, scored by the reference evaluation protocol.

Phases are resumable (skipped when their artifact exists):
  python tools/e2e_demo.py [--out DIR] [--trials N] [--epochs E]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from os.path import join as opj

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def phase_data(out: str, n_trials: int, seed: int = 0) -> str:
    from evfly_tpu.data.dataloading import write_h5_dataset
    from evfly_tpu.sim import generate_forest, rollout_to_trajectory, run_trial

    h5_path = opj(out, "data/datasets/simgen_forest.h5")
    if os.path.exists(h5_path):
        print(f"[DATA] {h5_path} exists, skipping generation")
        return h5_path
    os.makedirs(os.path.dirname(h5_path), exist_ok=True)
    rng = np.random.default_rng(seed)
    trajs = []
    for i in range(n_trials):
        desvel = float(rng.uniform(3.0, 5.0))
        field = generate_forest(rng, num_obstacles=30, trees=True)
        st = time.time()
        res = run_trial(field, mode="state", desired_vel=desvel, max_steps=7000)
        print(
            f"[DATA] trial {i}: {res['summary'].get('Success')} "
            f"{len(res['depths'])} frames desvel={desvel:.1f} ({time.time()-st:.0f}s)"
        )
        if len(res["depths"]) > 30:
            trajs.append(rollout_to_trajectory(res, f"rollout_{i:03d}"))
    write_h5_dataset(h5_path, trajs)
    print(f"[DATA] wrote {len(trajs)} trajectories to {h5_path}")
    return h5_path


def phase_train(out: str, epochs: int) -> str:
    from evfly_tpu.configs import EvflyConfig
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.train.learner import Learner

    done = glob.glob(opj(out, "logs/*/model_ep*.pth"))
    if done:
        best = sorted(glob.glob(opj(out, "logs/*/model_best_ep*.pth")))
        pick = best[-1] if best else sorted(done)[-1]
        print(f"[TRAIN] checkpoint exists: {pick}")
        return pick

    set_precision("default")  # from-scratch training: single-pass bf16 MXU
    cfg = EvflyConfig(
        basedir=out,
        logdir="logs",
        datadir=opj(out, "data/datasets"),
        dataset=["simgen_forest"],
        use_h5=True,
        events="evs_frames",
        keep_collisions=True,
        val_split=0.2,
        seed=7,
        batch_size=32,
        model_type=["OrigUNet", "VITFLY_ViTLSTM"],
        velpred=0,
        num_in_channels=2,
        bev=2,
        num_out_channels=1,
        num_recurrent=[1, 0],
        skip_type="interp",
        resize_input=[260, 346],
        rescale_depth=1.0,
        rescale_evs=-1.0,
        evs_min_cutoff=0.0,
        data_augmentation=1.0,
        N_eps=epochs,
        lr=1e-4,
        lr_warmup_epochs=1,
        save_model_freq=max(epochs // 2, 1),
        val_freq=max(epochs // 4, 1),
        print_trainprogress_freq=1,
        loss_weights=[10.0, 1.0],
        optional_loss_param=[5.0, -1.0],
        enc_num_layers=2, enc_kernel_sizes=[5, 3], enc_kernel_strides=[2, 2],
        enc_out_channels=[8, 32], enc_activations=["relu", "relu"],
        enc_pool_type="max", enc_invert_pool_inputs=True,
        enc_pool_kernels=[2, 2], enc_pool_strides=[2, 2],
        fc_num_layers=4, fc_layer_sizes=[1024, 128, 16, 1],
        fc_activations=["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
        fc_dropout_p=0.1,
    )
    learner = Learner(cfg)
    learner.train_loop()
    best = sorted(glob.glob(opj(learner.workspace, "model_best_ep*.pth")))
    pick = best[-1] if best else sorted(glob.glob(opj(learner.workspace, "model_ep*.pth")))[-1]
    print(f"[TRAIN] done -> {pick}")
    return pick


def phase_eval(out: str, checkpoint: str, n_trials: int, seed: int = 100) -> dict:
    from evfly_tpu.models import port
    from evfly_tpu.models.composites import OrigUNet_w_VITFLY_ViTLSTM
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.sim import generate_forest, run_trial
    from evfly_tpu.stream.pipeline import StreamingPipeline

    set_precision("default")
    enc = {
        "num_layers": 2, "kernel_sizes": [5, 3], "kernel_strides": [2, 2],
        "out_channels": [8, 32], "activations": ["relu", "relu"],
        "pool_type": "max", "invert_pool_inputs": True,
        "pool_kernels": [2, 2], "pool_strides": [2, 2], "conv_function": "conv2d",
    }
    fc = {
        "num_layers": 4, "layer_sizes": [1024, 128, 16, 1],
        "activations": ["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
        "dropout_p": 0.1,
    }
    model = OrigUNet_w_VITFLY_ViTLSTM(
        num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
        enc_params=enc, fc_params=fc, input_shape=[1, 1, 260, 346],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )
    params = model.init(jax.random.PRNGKey(0))
    params = port.load_into(params, port.load_state_dict(checkpoint))

    rng = np.random.default_rng(seed)
    summaries = {}
    for i in range(n_trials):
        desvel = 4.0
        pipe = StreamingPipeline(model, params, desvel=desvel)
        field = generate_forest(rng, num_obstacles=30, trees=True)
        st = time.time()
        res = run_trial(
            field, mode="vision", policy=pipe, desired_vel=desvel,
            max_steps=7000, log_images=False,
        )
        summaries[f"vision_{i:03d}"] = res["summary"]
        print(f"[EVAL] vision trial {i}: {res['summary']} ({time.time()-st:.0f}s)")

    with open(opj(out, "vision_eval.json"), "w") as f:
        json.dump(summaries, f, indent=2)
    return summaries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/e2e_demo")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--eval_trials", type=int, default=3)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    t0 = time.time()
    phase_data(args.out, args.trials)
    ckpt = phase_train(args.out, args.epochs)
    summaries = phase_eval(args.out, ckpt, args.eval_trials)
    n_ok = sum(1 for s in summaries.values() if s.get("Success"))
    print(
        f"[E2E] complete in {(time.time()-t0)/60:.1f} min; "
        f"vision success {n_ok}/{len(summaries)}"
    )


if __name__ == "__main__":
    main()
