"""evaluation_tools smoke: eval_plotter figure + visualize_images gif."""

import glob
import os

import numpy as np
import pytest

from evfly_tpu.configs import EvflyConfig
from evfly_tpu.train.learner import Learner

from test_learner import _base_config, _toy_dataset


@pytest.mark.slow
def test_eval_plotter_and_gifs(tmp_path, rng):
    from evfly_tpu.train.evaluation_tools import eval_plotter, visualize_images

    data_path = _toy_dataset(tmp_path, rng, n_traj=4, T=10)
    cfg = _base_config(
        tmp_path, data_path,
        model_type=["OrigUNet"],
        num_recurrent=[1, 0],
        bev=2,
        skip_type="interp",
        velpred=0,
        resize_input=[260, 346],
        N_eps=0,
        enc_num_layers=2, enc_kernel_sizes=[5, 3], enc_kernel_strides=[2, 2],
        enc_out_channels=[8, 32], enc_activations=["relu", "relu"],
        enc_pool_type="max", enc_invert_pool_inputs=True,
        enc_pool_kernels=[2, 2], enc_pool_strides=[2, 2],
        fc_num_layers=4, fc_layer_sizes=[1024, 128, 16, 1],
        fc_activations=["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
    )
    learner = Learner(cfg)
    learner.save_model(0)
    ckpt = glob.glob(os.path.join(learner.workspace, "model_ep*.pth"))[0]

    fig, title = eval_plotter(learner, ckpt, load_ckpt=True, dataSetstoTest=2)
    assert fig is not None and title
    out = os.path.join(learner.workspace, "plot.png")
    fig.savefig(out)
    assert os.path.getsize(out) > 0

    gifs = visualize_images(learner, ckpt, load_ckpt=False)
    assert gifs and all(os.path.getsize(g) > 0 for g in gifs)
