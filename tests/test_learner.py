"""Learner end-to-end smoke tests on a synthetic h5 dataset (small model)."""

import glob
import os

import numpy as np
import pytest

from evfly_tpu.configs import EvflyConfig
from evfly_tpu.data.dataloading import write_h5_dataset
from evfly_tpu.train.learner import Learner


def _toy_dataset(tmp_path, rng, n_traj=4, T=12, H=60, W=90):
    trajs = []
    for i in range(n_traj):
        meta = np.zeros((T, 21), np.float32)
        meta[:, 0] = np.arange(T)
        meta[:, 1] = np.arange(T) * 0.03
        meta[:, 2] = 4.0
        meta[:, 13] = 4.0  # forward velocity commands
        meta[:, 14] = rng.standard_normal(T) * 0.3
        trajs.append(
            {
                "name": f"traj_{i:03d}",
                "data": meta,
                "ims": rng.random((T, H, W)).astype(np.float32),
                "depths": rng.random((T, H, W)).astype(np.float32),
                "desvel": meta[:, 2],
                "evs": (rng.standard_normal((T - 1, H, W)) * 0.4).astype(np.float32),
            }
        )
    path = str(tmp_path / "toy")
    write_h5_dataset(path + ".h5", trajs)
    return path


def _base_config(tmp_path, data_path, **over):
    kw = dict(
        basedir=str(tmp_path),
        logdir="logs",
        datadir=str(tmp_path),
        dataset=[data_path],
        use_h5=True,
        events="evs_frames",
        keep_collisions=True,
        seed=-2,
        val_split=0.5,
        batch_size=8,
        model_type=["VITFLY_LSTMNet"],
        num_in_channels=2,
        num_out_channels=1,
        N_eps=2,
        lr=1e-3,
        lr_warmup_epochs=0,
        save_model_freq=1,
        val_freq=1,
        loss_weights=[10.0, 1.0],
        optional_loss_param=[5.0, -1.0],
        rescale_evs=-1.0,
        print_trainprogress_freq=1,
    )
    kw.update(over)
    return EvflyConfig(**kw)


@pytest.mark.slow
def test_learner_trains_and_checkpoints(tmp_path, rng):
    data_path = _toy_dataset(tmp_path, rng)
    cfg = _base_config(tmp_path, data_path)
    learner = Learner(cfg)
    assert learner.num_training_steps == 2 and learner.num_val_steps == 2

    # loss decreases over a few epochs on the tiny problem
    (l0, _), _ = learner.run_model(
        0, learner.train.traj_starts, learner.train.trajlength,
        np.arange(2), "val", batch_size=8, do_step=False,
    )
    learner.train_loop()
    (l1, _), _ = learner.run_model(
        0, learner.train.traj_starts, learner.train.trajlength,
        np.arange(2), "train", batch_size=8, do_step=False,
    )
    assert np.isfinite(l1)

    ws = learner.workspace
    assert os.path.exists(os.path.join(ws, "train_val_dirs.npy"))
    assert os.path.exists(os.path.join(ws, "args.txt"))
    assert os.path.exists(os.path.join(ws, "log.txt"))
    # periodic checkpoints named model_ep{ep:06d}.pth
    assert glob.glob(os.path.join(ws, "model_ep*.pth"))
    # per-term best checkpoints exist and old bests were deleted (≤1 per type)
    for pat in ("model_best_ep*.pth", "model_best0_ep*.pth", "model_best1_ep*.pth"):
        assert len(glob.glob(os.path.join(ws, pat))) <= 1
    assert glob.glob(os.path.join(ws, "model_best*_ep*.pth"))


@pytest.mark.slow
def test_learner_checkpoint_resume_and_trainval_restore(tmp_path, rng):
    data_path = _toy_dataset(tmp_path, rng)
    cfg = _base_config(tmp_path, data_path, seed=5, N_eps=1)
    learner = Learner(cfg)
    learner.train_loop()
    ckpts = sorted(glob.glob(os.path.join(learner.workspace, "model_ep*.pth")))
    dirs_before = list(learner.train.dirs)

    cfg2 = _base_config(
        tmp_path, data_path, seed=5, N_eps=1,
        checkpoint_path=[ckpts[-1]], load_trainval=True,
    )
    learner2 = Learner(cfg2)
    assert learner2.train.dirs == dirs_before  # split restored from npy
    assert learner2.num_eps_trained == int(os.path.basename(ckpts[-1])[-10:-4])


@pytest.mark.slow
def test_resume_continues_lr_schedule_and_best_tracking(tmp_path, rng):
    """A resumed run continues warmup/decay (reference learner.py:718-720
    seeds total_its from the parsed epoch) instead of restarting warmup,
    and out-of-sequence validation calls never reset best tracking."""
    data_path = _toy_dataset(tmp_path, rng)
    cfg = _base_config(tmp_path, data_path, seed=5, N_eps=2, lr_warmup_epochs=2)
    learner = Learner(cfg)
    learner.train_loop()  # 2 epochs = 4 iterations; final ckpt is model_ep000001
    ckpt = sorted(glob.glob(os.path.join(learner.workspace, "model_ep*.pth")))[-1]

    cfg2 = _base_config(
        tmp_path, data_path, seed=5, N_eps=1, lr_warmup_epochs=2,
        checkpoint_path=[ckpt], load_trainval=True,
    )
    learner2 = Learner(cfg2)
    assert learner2.num_eps_trained == 1
    assert learner2.total_its == learner2.num_eps_trained * learner2.num_training_steps
    learner2.train_loop()
    # last step of the resumed epoch ran at global it=3 of the 4-it warmup:
    # lr = 0.1*lr + 0.9*lr*(3/4), NOT the restarted-warmup 0.1*lr + 0.9*lr*(1/4)
    expected = 0.1 * cfg2.lr + (0.9 * cfg2.lr) * 3 / 4
    got = float(learner2.opt_state.hyperparams["learning_rate"])
    np.testing.assert_allclose(got, expected, rtol=1e-6)

    # best tracking survives an out-of-sequence validation call
    learner2.lowest_val_loss = [0.0] * len(learner2.lowest_val_loss)
    n_best = len(glob.glob(os.path.join(learner2.workspace, "model_best*.pth")))
    learner2.validation(learner2.num_eps_trained)  # epoch number that used to reset
    assert all(v == 0.0 for v in learner2.lowest_val_loss)  # not re-initialized
    assert len(glob.glob(os.path.join(learner2.workspace, "model_best*.pth"))) == n_best


@pytest.mark.slow
def test_learner_combine_checkpoints(tmp_path, rng):
    """D(θ)+V(φ) merge under origunet./vitfly_vitlstm. prefixes (learner.py:435-494)."""
    import jax

    from evfly_tpu.models import port
    from evfly_tpu.models.origunet import OrigUNet
    from evfly_tpu.models.vitfly import LSTMNetVIT

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
    # save standalone D(θ) and V(φ) checkpoints
    unet = OrigUNet(num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
                    enc_params=enc, fc_params=fc, velpred=0, form_BEV=2,
                    evs_min_cutoff=0.0, skip_type="interp",
                    input_shape=[1, 1, 260, 346])
    vit = LSTMNetVIT()
    p_unet = unet.init(jax.random.PRNGKey(1))
    p_vit = vit.init(jax.random.PRNGKey(2))
    cp0 = str(tmp_path / "Dtheta.pth")
    cp1 = str(tmp_path / "Vphi.pth")
    port.save_state_dict(p_unet, cp0)
    port.save_state_dict(p_vit, cp1)

    data_path = _toy_dataset(tmp_path, rng, H=260, W=346, T=4, n_traj=2)
    cfg = _base_config(
        tmp_path, data_path,
        model_type=["OrigUNet", "VITFLY_ViTLSTM"],
        checkpoint_path=[cp0, cp1],
        combine_checkpoints=True,
        load_trainval=False,
        num_recurrent=[1, 0],
        bev=2,
        skip_type="interp",
        resize_input=[260, 346],
        enc_num_layers=2, enc_kernel_sizes=[5, 3], enc_kernel_strides=[2, 2],
        enc_out_channels=[8, 32], enc_activations=["relu", "relu"],
        enc_pool_type="max", enc_invert_pool_inputs=True,
        enc_pool_kernels=[2, 2], enc_pool_strides=[2, 2],
        fc_num_layers=4, fc_layer_sizes=[1024, 128, 16, 1],
        fc_activations=["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
        N_eps=0,
    )
    learner = Learner(cfg)
    # merged weights landed under the composite prefixes
    np.testing.assert_array_equal(
        np.asarray(learner.params["origunet.unet_e11.weight"]),
        np.asarray(p_unet["unet_e11.weight"]),
    )
    np.testing.assert_array_equal(
        np.asarray(learner.params["vitfly_vitlstm.decoder.weight_orig"]),
        np.asarray(p_vit["decoder.weight_orig"]),
    )
