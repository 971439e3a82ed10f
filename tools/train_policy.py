"""Policy-quality pipeline driver (VERDICT round-2 item #2): reach x=60 m
with ZERO crashes under the reference protocol (evaluation_node.py:247-268).

Phases (subcommands, each resumable/artifact-gated):
  pretrain_v  V(φ): ViTLSTM depth→velocity on GT depth through
              clip(2·depth, 0, 1) — the composite's hand-off distribution
              (learner_models.py:634); the reference's own recipe trains
              V(φ) separately and merges (combine_state_dicts,
              learner.py:435-454).
  pretrain_d  D(θ): OrigUNet events→depth (loss on the depth term only).
  joint       combine D(θ)+V(φ) state dicts and fine-tune jointly.
  scratch     plain joint training from scratch (baseline for comparison).
  eval        batched vision-mode protocol evaluation on held-out forests.
  dagger      fly the current policy, label every visited state with the
              privileged expert, write an aggregation dataset (Ross et al.
              2011), ready for a fine-tune round.

Typical sequence:
  python tools/train_policy.py pretrain_v && ... pretrain_d && ... joint
  python tools/train_policy.py eval --ckpt <best>
  python tools/train_policy.py dagger --ckpt <best> && ... joint --extra-data dagger_r1 --resume <best>
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

# /data is wiped between rounds; default the data root to a gitignored dir
# inside the (durable) repo so datasets/checkpoints survive across rounds.
OUT = os.environ.get("EVFLY_OUT", "/root/repo/.data/evfly")
DATASETS = os.environ.get("EVFLY_DATASETS", "simgen_forest_big,simgen_forest_planner").split(",")

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


def _cfg(out, logsub, datasets, **over):
    from evfly_tpu.configs import EvflyConfig

    kw = dict(
        basedir=out,
        logdir=opj("logs", logsub),
        datadir=opj(out, "data/datasets"),
        dataset=datasets,
        use_h5=True,
        events="evs_frames",
        keep_collisions=False,      # drop expert-crash trajectories (reference default)
        val_split=0.15,
        seed=7,
        batch_size=32,
        num_recurrent=[1, 0],
        skip_type="interp",
        resize_input=[260, 346],
        rescale_depth=1.0,
        rescale_evs=-1.0,
        evs_min_cutoff=0.0,
        data_augmentation=1.0,
        device_data_quantized=True,   # 36k frames fit HBM as int8/uint8
        traj_scan=True,
        lr=1e-4,
        lr_warmup_epochs=1,
        print_trainprogress_freq=1,
        enc_num_layers=2, enc_kernel_sizes=[5, 3], enc_kernel_strides=[2, 2],
        enc_out_channels=[8, 32], enc_activations=["relu", "relu"],
        enc_pool_type="max", enc_invert_pool_inputs=True,
        enc_pool_kernels=[2, 2], enc_pool_strides=[2, 2],
        fc_num_layers=4, fc_layer_sizes=[1024, 128, 16, 1],
        fc_activations=["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
        fc_dropout_p=0.1,
    )
    kw.update(over)
    return EvflyConfig(**kw)


def _lr_over(args):
    """--lr override (round-4 finding: lr 1e-4 leaves the velocity head at
    the constant-output floor for the whole compute budget; see
    tools/overfit_probe.py / RESULTS.md round 4)."""
    return {"lr": args.lr} if getattr(args, "lr", None) else {}


def _train(cfg):
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.train.learner import Learner

    set_precision("default")  # from-scratch training: bf16 MXU path
    learner = Learner(cfg)
    learner.train_loop()
    best = sorted(glob.glob(opj(learner.workspace, "model_best_ep*.pth")))
    picks = best or sorted(glob.glob(opj(learner.workspace, "model_ep*.pth")))
    print(f"[TRAIN_POLICY] workspace {learner.workspace} -> {picks[-1]}")
    return picks[-1]


def cmd_pretrain_v(args):
    over = {}
    if getattr(args, "init", None):
        over = dict(checkpoint_path=[_as_epoch0(args.init, "v")], load_trainval=False)
    cfg = _cfg(
        OUT, "pretrain_v", DATASETS,
        model_type=["VITFLY_ViTLSTM"],
        # grouped epoch scan (see cmd_pretrain_d): ~5x fewer dispatches; the
        # per-trajectory path cost ~2.5 min/epoch at 16k frames (r4 MV run)
        epoch_scan=True,
        scan_group=16,
        num_in_channels=1,           # depth input
        num_out_channels=1,
        input_frame_scale=2.0,       # composite hand-off distribution
        loss_weights=[1.0, 0.0],
        optional_loss_param=[5.0, 0.0],
        N_eps=args.epochs,
        save_model_freq=max(args.epochs // 2, 1),
        val_freq=1,
        **_lr_over(args),
        **over,
    )
    return _train(cfg)


def cmd_pretrain_d(args):
    over = {}
    if getattr(args, "init", None):
        over = dict(checkpoint_path=[_as_epoch0(args.init, "d")], load_trainval=False)
    cfg = _cfg(
        OUT, "pretrain_d", DATASETS,
        model_type=["OrigUNet"],
        # chunk length 16 (not 32): the OrigUNet backward stash for a
        # 32-frame chunk at 260x346 plus the ~9.2 GB device-resident
        # dataset exceeded v5e HBM (observed RESOURCE_EXHAUSTED); halving
        # the chunk halves the stash.  Validation (stash-free) fits at 32.
        batch_size=16,
        # grouped epoch scan: a whole-epoch OrigUNet dispatch crashed the
        # TPU worker in r2 (likely the tunnel's bound on single-dispatch
        # runtime); groups of 16 trajectories bound the dispatch to ~10 s
        # while cutting per-trajectory dispatch overhead ~16x (r4 measured
        # ~85 s/epoch at 16k frames on the per-trajectory path, most of it
        # tunnel dispatch).
        epoch_scan=True,
        scan_group=16,
        velpred=0,
        **over,
        num_in_channels=2,           # event input
        num_out_channels=1,
        bev=2,
        loss_weights=[0.0, 1.0],
        optional_loss_param=[0.0, -1.0],
        N_eps=args.epochs,
        save_model_freq=max(args.epochs // 2, 1),
        val_freq=1,
        **_lr_over(args),
    )
    return _train(cfg)


def _joint_cfg(args, **over):
    datasets = DATASETS + (args.extra_data or [])
    kw = dict(
        model_type=["OrigUNet", "VITFLY_ViTLSTM"],
        batch_size=16,               # HBM headroom — see cmd_pretrain_d
        epoch_scan=True,             # grouped — see cmd_pretrain_d
        scan_group=16,
        velpred=0,
        num_in_channels=2,
        num_out_channels=1,
        bev=2,
        loss_weights=[10.0, 1.0],
        optional_loss_param=[5.0, -1.0],
        N_eps=args.epochs,
        save_model_freq=max(args.epochs // 2, 1),
        val_freq=1,
    )
    kw.update(_lr_over(args))
    kw.update(over)
    return _cfg(OUT, args.logsub, datasets, **kw)


def _as_epoch0(ckpt, tag):
    """Copy a checkpoint to an epoch-000000 name so the joint run starts its
    own epoch/LR accounting instead of inheriting the pretrain epoch parsed
    from the filename (port.parse_epoch_from_path)."""
    import shutil

    dst = opj(OUT, f"combine_{tag}_model_ep000000.pth")
    shutil.copyfile(ckpt, dst)
    return dst


def cmd_joint(args):
    over = {}
    if args.resume:
        # restore the checkpoint's own train/val split (no val leakage)
        over = dict(checkpoint_path=[args.resume], load_trainval=True)
    elif args.d_ckpt and args.v_ckpt:
        over = dict(
            checkpoint_path=[_as_epoch0(args.d_ckpt, "d"), _as_epoch0(args.v_ckpt, "v")],
            combine_checkpoints=True,
            load_trainval=False,
        )
    cfg = _joint_cfg(args, **over)
    return _train(cfg)


def cmd_scratch(args):
    return _train(_joint_cfg(args))


def _build_pipeline(ckpt, num_streams, desvels):
    from evfly_tpu.models import port
    from evfly_tpu.models.composites import OrigUNet_w_VITFLY_ViTLSTM
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.stream.pipeline import BatchedStreamingPipeline

    set_precision("default")
    model = OrigUNet_w_VITFLY_ViTLSTM(
        num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
        enc_params=ENC, fc_params=FC, input_shape=[1, 1, 260, 346],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )
    params = model.init(jax.random.PRNGKey(0))
    params = port.load_into(params, port.load_state_dict(ckpt))
    return BatchedStreamingPipeline(model, params, num_streams=num_streams, desvel=desvels)


def _protocol_trials(ckpt, n_trials, batch, seed, mode="vision", desvel=4.0,
                     dynamics="first_order"):
    from evfly_tpu.sim import generate_forest
    from evfly_tpu.sim.batched import run_trials_batched

    rng = np.random.default_rng(seed)
    all_results = []
    n_done = 0
    while n_done < n_trials:
        G = min(batch, n_trials - n_done)
        fields = [
            generate_forest(rng, num_obstacles=int(rng.integers(25, 41)), trees=True)
            for _ in range(G)
        ]
        desvels = np.full(G, desvel)
        pipe = _build_pipeline(ckpt, G, desvels)
        t0 = time.time()
        results = run_trials_batched(
            fields, mode=mode, desired_vels=desvels, policy=pipe,
            policy_every=6, max_steps=7000, seed=seed + n_done,
            obstacle_pad=48, log_images=(mode == "dagger"),
            dynamics=dynamics,
        )
        print(f"[TRAIN_POLICY] {mode} batch of {G} in {time.time()-t0:.0f}s", flush=True)
        all_results.extend(results)
        n_done += G
    return all_results


def cmd_eval(args):
    results = _protocol_trials(
        args.ckpt, args.trials, args.batch, seed=args.seed,
        desvel=args.desvel, dynamics=args.dynamics,
    )
    summaries = [r["summary"] for r in results]
    n_success = sum(1 for s in summaries if s.get("Success"))
    n_finish = sum(1 for s in summaries if "time_to_finish" in s)
    crashes = [s.get("number_crashes", -1) for s in summaries]
    # dodge diagnostic: in vision mode the logged velcmd columns (13:16 of
    # the 21-col reference data.csv layout) hold the EXECUTED policy
    # command — lateral magnitude is the "does it dodge" signal (round-1
    # failure mode was |vy| <= 0.17 m/s, i.e. near-constant output)
    vy = [np.abs(r["log"][:, 14]) for r in results if len(r["log"])]
    report = {
        "ckpt": args.ckpt,
        "desvel": args.desvel,
        "dynamics": args.dynamics,
        "mean_abs_vy_cmd": float(np.mean([v.mean() for v in vy])) if vy else None,
        "p95_abs_vy_cmd": float(np.mean([np.percentile(v, 95) for v in vy])) if vy else None,
        "trials": len(summaries),
        "success_rate": n_success / len(summaries),
        "finish_rate": n_finish / len(summaries),
        "crashes": crashes,
        "mean_crashes": float(np.mean([c for c in crashes if c >= 0])) if n_finish else -1,
        "time_to_finish": [s.get("time_to_finish") for s in summaries],
        "summaries": summaries,
    }
    out_json = args.out_json or opj(OUT, f"eval_{int(time.time())}.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("trials", "success_rate", "finish_rate", "mean_crashes",
                       "crashes", "mean_abs_vy_cmd", "p95_abs_vy_cmd")}))
    return report


def cmd_dagger(args):
    from evfly_tpu.data.dataloading import write_h5_dataset
    from evfly_tpu.sim import rollout_to_trajectory

    results = _protocol_trials(
        args.ckpt, args.trials, args.batch, seed=args.seed, mode="dagger",
        dynamics=args.dynamics,
    )
    trajs = []
    for i, res in enumerate(results):
        if len(res["depths"]) > 30:
            traj = rollout_to_trajectory(res, f"dagger_{i:04d}")
            # Crashes here happened under the POLICY's actions; the logged
            # labels are the privileged expert's per-state commands, which
            # stay valid supervision.  The dataloader's keep_collisions=False
            # filter (reference semantics: drop bad EXPERT demonstrations)
            # would otherwise discard exactly the covariate-shift states
            # DAgger exists to capture — so clear the is_collide column.
            traj["data"][:, -1] = 0.0
            trajs.append(traj)
    h5 = opj(OUT, "data/datasets", f"{args.name}.h5")
    write_h5_dataset(h5, trajs)
    crashes = [r["summary"].get("number_crashes", -1) for r in results]
    print(f"[TRAIN_POLICY] dagger: wrote {len(trajs)} trajs to {h5}; "
          f"policy crashes per trial: {crashes}")
    return h5


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("pretrain_v", "pretrain_d"):
        p = sub.add_parser(name)
        p.add_argument("--epochs", type=int, default=10)
        p.add_argument("--init", type=str, default=None,
                       help="warm-start checkpoint (copied to an ep000000 name)")
        p.add_argument("--lr", type=float, default=None)
    for name in ("joint", "scratch"):
        p = sub.add_parser(name)
        p.add_argument("--epochs", type=int, default=20)
        p.add_argument("--logsub", type=str, default=name)
        p.add_argument("--extra-data", nargs="*", default=None)
        p.add_argument("--resume", type=str, default=None)
        p.add_argument("--d-ckpt", type=str, default=None)
        p.add_argument("--v-ckpt", type=str, default=None)
        p.add_argument("--lr", type=float, default=None)
    p = sub.add_parser("eval")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--batch", type=int, default=20)
    p.add_argument("--seed", type=int, default=90000)
    p.add_argument("--out-json", type=str, default=None)
    p.add_argument("--desvel", type=float, default=4.0)
    p.add_argument("--dynamics", type=str, default="first_order",
                   choices=["first_order", "rigid"])
    p = sub.add_parser("dagger")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--trials", type=int, default=40)
    p.add_argument("--batch", type=int, default=20)
    p.add_argument("--seed", type=int, default=50000)
    p.add_argument("--name", type=str, default="dagger_r1")
    p.add_argument("--dynamics", type=str, default="first_order",
                   choices=["first_order", "rigid"])

    args = ap.parse_args()
    fn = {
        "pretrain_v": cmd_pretrain_v, "pretrain_d": cmd_pretrain_d,
        "joint": cmd_joint, "scratch": cmd_scratch,
        "eval": cmd_eval, "dagger": cmd_dagger,
    }[args.cmd]
    fn(args)


if __name__ == "__main__":
    main()
