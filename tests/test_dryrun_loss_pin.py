"""Pin the flagship dryrun epoch loss (VERDICT r4 weak #2).

History: the multi-chip dryrun's Learner epoch on this exact synthetic
dataset printed ep_loss 37.596 in the r02/r03 driver runs and 36.433 in
r04.  Root cause (established in round 5 by re-running every code version
r03..r04-HEAD on one machine): ALL versions produce the identical value on
a given host — the shift is ENVIRONMENTAL, not semantic.  The driver hops
between host generations whose XLA:CPU codegen differs (the persistent
compile cache even logs `cpu_aot_loader.cc` machine-feature mismatches
between rounds), and Adam's per-parameter normalization amplifies tiny fp
differences over an epoch into a few percent of ep_loss.

So this test pins two things at two different strengths:

1. The ABSOLUTE value, with a tolerance wide enough for the observed
   cross-host band (~3.2%) — catches gross semantic drift (wrong
   preprocessing, loss-term regression) on any machine.
2. Bitwise REPRODUCIBILITY within one host: a second run of the identical
   config — which loads through the preprocessed-tensor cache the first
   run wrote — must produce the EXACT same ep_loss.  This is the real
   round-4 invariant: the cache/lazy-concat/blockwise-staging data path
   computes precisely what the fresh h5 load computes.

Reference loss semantics: /root/reference/learner/learner.py:1101-1144.
"""

import numpy as np
import pytest

from evfly_tpu.configs import EvflyConfig
from evfly_tpu.data.dataloading import write_h5_dataset
from evfly_tpu.train.learner import Learner

# the r02-r04 driver-tracked value, re-measured 36.433 on the round-5 host
PINNED_EP_LOSS = 36.433
CROSS_HOST_RTOL = 5e-2  # observed cross-host band was 3.2% (37.596/36.433)


def _flagship_dryrun_dataset(tmp) -> None:
    """The exact synthetic dataset the r02-r04 dryrun Learner epoch used
    (4 trajectories, T=10, 200x266 — smallest input the 5-level valid-pad
    UNet admits; production is 260x346)."""
    rng = np.random.default_rng(0)
    T, H, W = 10, 200, 266
    trajs = []
    for i in range(4):
        meta = np.zeros((T, 21), np.float32)
        meta[:, 0] = np.arange(T)
        meta[:, 1] = np.arange(T) * 0.03
        meta[:, 2] = 4.0
        meta[:, 13] = 4.0
        meta[:, 14] = rng.standard_normal(T) * 0.3
        trajs.append({
            "name": f"traj_{i:03d}", "data": meta,
            "ims": rng.random((T, H, W)).astype(np.float32),
            "depths": rng.random((T, H, W)).astype(np.float32),
            "desvel": meta[:, 2],
            "evs": (rng.standard_normal((T - 1, H, W)) * 0.4).astype(np.float32),
        })
    write_h5_dataset(f"{tmp}/toy.h5", trajs)


def _run_epoch(tmp, sub: str) -> float:
    enc = {
        "num_layers": 2, "kernel_sizes": [5, 3], "kernel_strides": [2, 2],
        "out_channels": [8, 32], "activations": ["relu", "relu"],
        "pool_type": "max", "invert_pool_inputs": True,
        "pool_kernels": [2, 2], "pool_strides": [2, 2],
        "conv_function": "conv2d",
    }
    cfg = EvflyConfig(
        basedir=str(tmp), logdir="logs", datadir=str(tmp),
        dataset=[f"{tmp}/toy"],
        use_h5=True, events="evs_frames", keep_collisions=True, seed=5,
        val_split=0.5, batch_size=5,
        model_type=["OrigUNet", "VITFLY_ViTLSTM"],
        velpred=0, bev=2, skip_type="interp", num_recurrent=[1, 0],
        resize_input=[200, 266], evs_min_cutoff=0.0,
        enc_num_layers=enc["num_layers"],
        enc_kernel_sizes=enc["kernel_sizes"],
        enc_kernel_strides=enc["kernel_strides"],
        enc_out_channels=enc["out_channels"],
        enc_activations=enc["activations"],
        enc_pool_type=enc["pool_type"],
        enc_invert_pool_inputs=enc["invert_pool_inputs"],
        enc_pool_kernels=enc["pool_kernels"],
        enc_pool_strides=enc["pool_strides"],
        num_in_channels=2, num_out_channels=1, N_eps=1, lr=1e-3,
        lr_warmup_epochs=0, save_model_freq=10, val_freq=10,
        eval_tools_freq=0, loss_weights=[10.0, 1.0],
        optional_loss_param=[5.0, -1.0], data_augmentation=0.0,
        dp_devices=1, dp_chunks_per_device=8, ws_suffix=sub,
    )
    learner = Learner(cfg)
    losses = []
    orig = learner.mylogger

    def capture(msg):
        orig(msg)
        if "ep_loss =" in msg:
            losses.append(float(msg.split("ep_loss = ")[1].split(",")[0]))

    learner.mylogger = capture
    learner.train_loop()
    return losses[0]


@pytest.mark.slow
def test_flagship_dryrun_ep_loss_pinned(tmp_path):
    _flagship_dryrun_dataset(tmp_path)

    # fresh h5 load (writes the preprocessed cache as a side effect)
    loss_fresh = _run_epoch(tmp_path, "_pin_a")
    np.testing.assert_allclose(
        loss_fresh, PINNED_EP_LOSS, rtol=CROSS_HOST_RTOL,
        err_msg=(
            "flagship dryrun ep_loss moved beyond the documented cross-host "
            "band — a SEMANTIC training change, not fp-environment noise"
        ),
    )

    # cache-hit load: must be bitwise identical — the preprocessed-tensor
    # cache + lazy-concat + blockwise staging path computes exactly what
    # the fresh load computes (the r04 suspect, now pinned at atol=0)
    loss_cached = _run_epoch(tmp_path, "_pin_b")
    assert loss_cached == loss_fresh, (
        f"cache-path epoch loss {loss_cached!r} != fresh-load {loss_fresh!r}"
    )
