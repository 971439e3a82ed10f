"""Config parsing parity with the reference's configargparse .txt format."""

import pathlib

import pytest

from evfly_tpu.configs import EvflyConfig, argparsing, parse_config_file

from conftest import REFERENCE_ROOT, has_reference


def test_parse_shipped_training_config():
    if not has_reference():
        pytest.skip("reference configs unavailable")
    cfg = parse_config_file(str(REFERENCE_ROOT / "learner/configs/config.txt"))
    assert cfg.model_type_norm == "OrigUNet"
    assert cfg.bev == 2
    assert cfg.num_recurrent == [1, 0]
    assert cfg.resize_input == [260, 346]
    assert cfg.loss_weights == [10.0, 1.0]
    assert cfg.optional_loss_param == [5.0, -1.0]
    assert cfg.rescale_evs == -1.0
    assert cfg.batch_size == 64
    assert cfg.seed == 7
    assert cfg.skip_type == "interp"
    assert cfg.use_h5 is True
    assert cfg.events_filename == "evs_frames.npy"
    assert cfg.enc_kernel_sizes == [5, 3]
    assert cfg.enc_invert_pool_inputs is True
    assert cfg.fc_layer_sizes == [1024, 128, 16, 1]
    assert cfg.checkpoint_path_norm == ""


def test_parse_joint_eval_config():
    if not has_reference():
        pytest.skip("reference configs unavailable")
    cfg = parse_config_file(str(REFERENCE_ROOT / "learner/configs/eval_config_sim_Dtheta_vitlstm.txt"))
    assert cfg.model_type_norm == ["OrigUNet", "VITFLY_ViTLSTM"]
    assert len(cfg.checkpoint_path) == 2
    assert cfg.combine_checkpoints is True
    assert cfg.velpred == 0


def test_cli_overrides(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("model_type = OrigUNet\nlr = 1e-4\nbatch_size = 64\n")
    cfg = argparsing(["--config", str(p), "--lr", "0.01", "--use_h5", "--loss_weights", "[2.0, 3.0]"])
    assert cfg.lr == 0.01
    assert cfg.use_h5 is True
    assert cfg.loss_weights == [2.0, 3.0]
    assert cfg.batch_size == 64


def test_defaults_match_reference_argparse():
    cfg = EvflyConfig()
    # defaults from learner.py:1167-1272
    assert cfg.lr == 1e-4 and cfg.N_eps == 100 and cfg.lr_warmup_epochs == 5
    assert cfg.val_split == 0.2 and cfg.batch_size == 0
    assert cfg.num_in_channels == 2 and cfg.num_out_channels == 1
    assert cfg.skip_type == "crop" and cfg.bev == 0
    assert cfg.enc_out_channels == [16, 64]
    assert cfg.fc_activations == ["leaky_relu", "leaky_relu", "tanh"]
