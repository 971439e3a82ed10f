"""Chunk-DP training QUALITY vs the sequential path (VERDICT r2 item #6).

`tests/test_dp_learner.py` proves the sharded DP epoch equals the same
G-chunk step on a 1-device mesh (correctness).  What it does not show is the
optimizer-semantics tradeoff: the DP epoch takes ONE Adam step per G chunks
with averaged gradients (`parallel/data_parallel.py`), where the reference —
and this repo's single-device path — steps Adam per chunk.  Fewer, larger
steps per epoch can change training quality.

This tool measures that on REAL pipeline data: it subsets the planner
dataset (first --trajs trajectories, first --frames frames each), trains
the flagship joint OrigUNet+ViTLSTM for --epochs epochs twice from the same
init/seed — sequential (dp_devices=0) vs chunk-DP over the virtual 8-CPU
mesh (dp_devices=8) — and tabulates the ep_loss / val_loss trajectories.

Runs entirely on CPU (both arms, apples-to-apples):

  python tools/dp_quality.py --out-json artifacts/dp_quality.json

Ref analog for the scale-out motivation:
/root/reference/flightmare/flightlib/src/envs/vec_env_base.cpp:124.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize rewrites jax_platforms to "axon,cpu" at interpreter
# start, so the env var above does NOT stick — the explicit config update is
# the only reliable CPU forcing (same reason as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def subset_h5(src: str, dst: str, n_traj: int, n_frames: int) -> str:
    import h5py

    from evfly_tpu.data.dataloading import write_h5_dataset

    trajs = []
    with h5py.File(src, "r") as f:
        for name in sorted(f.keys())[:n_traj]:
            g = f[name]
            T = min(n_frames, len(g["ims"]))
            trajs.append(
                {
                    "name": name,
                    "data": np.asarray(g["data"][:T]),
                    "ims": np.asarray(g["ims"][:T]),
                    "depths": np.asarray(g["depths"][:T]),
                    "desvel": np.asarray(g["desvel"][:T]),
                    "evs": np.asarray(g["evs"][: T - 1]),
                }
            )
    write_h5_dataset(dst + ".h5", trajs)
    return dst


def subset_from_cache(src_h5: str, dst: str, n_traj: int, n_frames: int) -> str:
    """Rebuild the subset from the dataset's preprocessed cache when the
    source h5 has been deleted to reclaim disk (tools/stamp_and_rm_h5.py).

    The cached tensors are already resized/rescaled; re-running the loader
    on them is deterministic and IDENTICAL for both arms, which is all this
    sequential-vs-DP A/B needs."""
    from evfly_tpu.data.dataloading import write_h5_dataset

    croot = src_h5[:-3] + "_cache"
    # Prefer an entry that records its dataloader args (cache_key.json) AND
    # has event frames; different-args entries would silently change the A/B
    # dataset (advisor r4), so at minimum log which entry was picked.
    candidates = []
    for d in sorted(os.listdir(croot)):
        p = os.path.join(croot, d)
        if os.path.isfile(os.path.join(p, "train_meta.npy")):
            has_evs = os.path.isfile(os.path.join(p, "train_evs.npy"))
            has_key = os.path.isfile(os.path.join(p, "cache_key.json"))
            candidates.append((not has_evs, not has_key, d, p))
    assert candidates, f"no preprocessed cache entries under {croot}"
    candidates.sort()
    no_evs, no_key, d, entry = candidates[0]
    assert not no_evs, f"no cache entry under {croot} has event frames"
    key_desc = "no cache_key.json"
    if not no_key:
        with open(os.path.join(entry, "cache_key.json")) as fh:
            key_desc = fh.read()
    print(f"[DP_QUALITY] cache entry {d} ({key_desc})")

    def load(name, mmap=True):
        return np.load(os.path.join(entry, name), mmap_mode="r" if mmap else None)

    meta, ims, depths = load("train_meta.npy"), load("train_ims.npy"), load("train_depths.npy")
    desvel, tlen = load("train_desvel.npy"), load("train_trajlength.npy", mmap=False)
    ev_lens = load("train_ev_lens.npy", mmap=False)
    evs = load("train_evs.npy")
    starts = np.cumsum(tlen) - tlen
    ev_starts = np.cumsum(ev_lens) - ev_lens
    trajs = []
    for i in range(min(n_traj, len(tlen))):
        T = int(min(n_frames, tlen[i]))
        s, es = int(starts[i]), int(ev_starts[i])
        trajs.append(
            {
                "name": f"traj_{i:03d}",
                "data": np.asarray(meta[s : s + T]),
                "ims": np.asarray(ims[s : s + T]),
                "depths": np.asarray(depths[s : s + T]),
                "desvel": np.asarray(desvel[s : s + T]),
                "evs": np.asarray(evs[es : es + T - 1]),
            }
        )
    write_h5_dataset(dst + ".h5", trajs)
    return dst


def run_arm(tmp, data_path, dp_devices, epochs, tag):
    from evfly_tpu.configs import EvflyConfig
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.train.learner import Learner

    set_precision("default")
    cfg = EvflyConfig(
        basedir=tmp,
        logdir=f"logs_{tag}",
        datadir=os.path.dirname(data_path),
        dataset=[data_path],
        use_h5=True,
        events="evs_frames",
        keep_collisions=True,
        val_split=0.25,
        seed=11,
        batch_size=16,
        model_type=["OrigUNet", "VITFLY_ViTLSTM"],
        velpred=0,
        num_in_channels=2,
        num_out_channels=1,
        bev=2,
        num_recurrent=[1, 0],
        skip_type="interp",
        resize_input=[260, 346],
        rescale_depth=1.0,
        rescale_evs=-1.0,
        evs_min_cutoff=0.0,
        data_augmentation=0.0,   # rng-free: isolates the optimizer semantics
        loss_weights=[10.0, 1.0],
        optional_loss_param=[5.0, -1.0],
        lr=1e-4,
        lr_warmup_epochs=1,
        N_eps=epochs,
        save_model_freq=epochs + 1,  # no checkpoint churn
        val_freq=1,
        print_trainprogress_freq=1,
        dp_devices=dp_devices,
        dp_chunks_per_device=1,
    )
    learner = Learner(cfg)
    ep_losses, val_losses = [], []
    orig = learner.mylogger

    def capture(msg):
        orig(msg)
        if "ep_loss = " in msg:
            ep_losses.append(float(msg.split("ep_loss = ")[1].split(",")[0]))
        # only the "[VAL] Validated epoch ..." line carries the epoch val
        # loss ("New lowest val_loss = X at ep N/M" would mis-parse)
        if msg.startswith("[VAL] Validated"):
            val_losses.append(float(msg.split("val_loss = ")[1].split(",")[0]))

    learner.mylogger = capture
    learner.train_loop()
    return ep_losses, val_losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--src", default=os.environ.get("EVFLY_OUT", "/root/repo/.data/evfly") + "/data/datasets/simgen_forest_planner.h5"
    )
    ap.add_argument("--trajs", type=int, default=6)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--tmp", default="/tmp/dpq")
    ap.add_argument("--out-json", default="artifacts/dp_quality.json")
    args = ap.parse_args()

    assert jax.device_count() >= 8, "needs the virtual 8-CPU mesh"
    os.makedirs(args.tmp, exist_ok=True)
    build = subset_h5 if os.path.exists(args.src) else subset_from_cache
    data_path = build(
        args.src, os.path.join(args.tmp, "dpq_subset"), args.trajs, args.frames
    )

    seq_ep, seq_val = run_arm(args.tmp, data_path, 0, args.epochs, "seq")
    dp_ep, dp_val = run_arm(args.tmp, data_path, 8, args.epochs, "dp8")

    report = {
        "dataset": args.src,
        "subset": {"trajs": args.trajs, "frames": args.frames},
        "epochs": args.epochs,
        "sequential": {"ep_loss": seq_ep, "val_loss": seq_val},
        "dp8_chunk": {"ep_loss": dp_ep, "val_loss": dp_val},
        "final_val_ratio_dp_over_seq": (
            dp_val[-1] / seq_val[-1] if seq_val and dp_val else None
        ),
    }
    print(json.dumps(report, indent=2))
    with open(args.out_json, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
