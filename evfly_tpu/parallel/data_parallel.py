"""Data-parallel (multi-stream) training over a device mesh.

BASELINE.json config 5: "Two-stage OrigUNet+ViTLSTM joint training,
multi-stream batched on a v5p slice."  Frames/streams are sharded across the
``data`` mesh axis; params and optimizer state are replicated; jit with
output shardings makes XLA emit the gradient psum over ICI — no explicit
collectives needed (the scaling-book recipe: annotate, let XLA insert).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import is_trainable_key
from ..train.stepfn import make_train_step
from .mesh import batch_sharding


def make_dp_train_step(
    model,
    kind: str,
    optimizer,
    mesh: Mesh,
    loss_weights: Optional[Sequence[float]] = None,
    optional_loss_param: Optional[Sequence[float]] = None,
    data_augmentation: bool = False,
    num_out_channels: int = 1,
    axis_name: str = "data",
):
    """jit the shared train step with DP shardings over `mesh`.

    Batch arrays must have a leading frame axis divisible by the mesh size.
    Returns step(params, opt_state, batch, rng).
    """
    step = make_train_step(
        model, kind, optimizer, loss_weights, optional_loss_param,
        data_augmentation, num_out_channels,
    )
    repl = NamedSharding(mesh, P())

    def batch_shardings(batch):
        return {
            k: batch_sharding(mesh, v.ndim, axis_name) for k, v in batch.items()
        }

    def sharded_step(params, opt_state, batch, rng):
        in_shardings = (
            jax.tree_util.tree_map(lambda _: repl, params),
            jax.tree_util.tree_map(lambda _: repl, opt_state),
            batch_shardings(batch),
            repl,
        )
        jitted = jax.jit(
            step,
            in_shardings=in_shardings,
            out_shardings=(None, None, None, None, None),
        )
        return jitted(params, opt_state, batch, rng)

    return sharded_step


def dp_train_demo_step(n_devices: int, input_hw=(188, 196), batch: int = 8):
    """Build + run ONE data-parallel joint-model train step on tiny shapes.

    Used by the multi-chip dry run: constructs the full flagship training
    step (OrigUNet with ConvLSTM bottleneck + ViTLSTM second stage, Adam,
    weighted two-term loss) on an ``n_devices`` DP mesh and executes a
    single step.  input_hw must satisfy the UNet's 5-level valid-conv
    minimum (needs a >=4 px bottleneck: ~188 px per side).
    """
    import numpy as np
    import jax.numpy as jnp

    from ..models.composites import OrigUNet_w_VITFLY_ViTLSTM
    from .mesh import make_mesh, replicate_params, shard_batch

    enc_params = {
        "num_layers": 2, "kernel_sizes": [5, 3], "kernel_strides": [2, 2],
        "out_channels": [8, 32], "activations": ["relu", "relu"],
        "pool_type": "max", "invert_pool_inputs": True,
        "pool_kernels": [2, 2], "pool_strides": [2, 2], "conv_function": "conv2d",
    }
    fc_params = {
        "num_layers": 4, "layer_sizes": [1024, 128, 16, 1],
        "activations": ["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
        "dropout_p": 0.1,
    }
    model = OrigUNet_w_VITFLY_ViTLSTM(
        num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
        enc_params=enc_params, fc_params=fc_params,
        input_shape=[1, 1, input_hw[0], input_hw[1]],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.masked(optax.adam(1e-4), {k: is_trainable_key(k) for k in params})
    opt_state = optimizer.init(params)

    mesh = make_mesh(n_devices)
    params = replicate_params(params, mesh)
    opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))

    H, W = input_hw
    rng = np.random.default_rng(0)
    batch_data = {
        "input": rng.standard_normal((batch, 1, H, W)).astype(np.float32),
        "desvel": np.full((batch, 1), 4.0, np.float32),
        "gt_vel": rng.standard_normal((batch, 3)).astype(np.float32),
        "gt_frames": rng.random((batch, 1, H, W)).astype(np.float32),
        "mask": np.ones((batch,), np.float32),
    }
    batch_data = shard_batch(batch_data, mesh)

    step = make_dp_train_step(
        model, "joint_vitlstm", optimizer, mesh,
        loss_weights=[10.0, 1.0], optional_loss_param=[5.0, -1.0],
    )
    params, opt_state, loss, values, gradnorm = step(
        params, opt_state, batch_data, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(loss)
    return float(loss), [float(v) for v in values], float(gradnorm)
