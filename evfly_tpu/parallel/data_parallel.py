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


def make_dp_chunked_train_step(
    model,
    kind: str,
    optimizer,
    mesh: Mesh,
    B: int,
    num_in_channels: int,
    num_out_channels: int = 1,
    loss_weights: Optional[Sequence[float]] = None,
    optional_loss_param: Optional[Sequence[float]] = None,
    data_augmentation: bool = False,
    axis_name: str = "data",
    input_frame_scale: float = 1.0,
):
    """Chunk-level DP: G independent trajectory chunks per optimizer step.

    The correct DP axis for this workload is the CHUNK, not the frame:
    training zero-initializes recurrent state per chunk (reference passes
    hidden=None per chunk, learner.py:1047-1049), so chunks are independent
    work items, while the frame axis inside a chunk is TIME for the
    ConvLSTM/LSTM scans and must stay device-local.  Each device gathers its
    chunks from the (replicated) device-resident split via the batch slicer
    and runs the full forward; gradients/losses are averaged over the real
    (non-padded) chunks — XLA inserts the psum over ICI from the shardings.

    Step signature: (params, opt_state, data, idxs, rngs) ->
    (params, opt_state, loss_sum, values_sum, gradnorm, n_real)
    where idxs = {'start','ev_start','n_valid'} each (G,) int32, rngs (G, 2)
    uint32 key array.  Padded work items (n_valid == 0) contribute zero loss
    and zero grads (losses._masked_mean guards empty masks); the mean is
    taken over the real count, so remainder-padded steps are exact.
    loss_sum / values_sum are sums over real chunks (callers accumulate the
    reference's per-trajectory epoch statistics from them).
    """
    import jax.numpy as jnp

    from ..train.stepfn import make_batch_slicer, make_forward_loss, spectral_updates

    forward_loss = make_forward_loss(
        model, kind, loss_weights, optional_loss_param,
        data_augmentation=data_augmentation, num_out_channels=num_out_channels,
        train=True, input_frame_scale=input_frame_scale,
    )
    batch_fn = make_batch_slicer(B, num_in_channels, num_out_channels)

    def step(params, opt_state, data, idxs, rngs):
        params = {**params, **spectral_updates(params)}
        diff = {k: v for k, v in params.items() if is_trainable_key(k)}
        nondiff = {k: v for k, v in params.items() if not is_trainable_key(k)}
        real = (idxs["n_valid"] > 0).astype(jnp.float32)          # (G,)
        n_real = jnp.maximum(real.sum(), 1.0)

        def one(diff_params, idx, rng):
            loss, (values, updates, _pv, _pd) = forward_loss(
                {**diff_params, **nondiff}, batch_fn(data, idx), rng
            )
            return loss, values, updates

        def mean_loss(diff_params):
            losses, values, updates = jax.vmap(one, in_axes=(None, 0, 0))(
                diff_params, idxs, rngs
            )
            # guard padded chunks: zero their (potentially NaN) state updates
            updates = jax.tree_util.tree_map(
                lambda u: jnp.sum(
                    jnp.where(real.reshape((-1,) + (1,) * (u.ndim - 1)) > 0, u, 0.0),
                    axis=0,
                )
                / n_real,
                updates,
            )
            return losses.sum() / n_real, (losses.sum(), values.sum(0), updates)

        (_, (loss_sum, values_sum, updates)), grads = jax.value_and_grad(
            mean_loss, has_aux=True
        )(diff)
        gradnorm = optax.global_norm(grads)
        grads_full = {**{k: jnp.zeros_like(v) for k, v in nondiff.items()}, **grads}
        opt_updates, opt_state = optimizer.update(grads_full, opt_state, params)
        params = optax.apply_updates(params, opt_updates)
        params = {**params, **updates}
        return params, opt_state, loss_sum, values_sum, gradnorm, n_real

    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, {"start": shard0, "ev_start": shard0, "n_valid": shard0}, shard0),
        donate_argnums=(0, 1),
    )


def _flagship_model(input_hw):
    """The flagship joint composite (OrigUNet with ConvLSTM bottleneck +
    ViTLSTM second stage) at ``input_hw`` — shared by the dry-run demo
    steps.  input_hw must satisfy the UNet's 5-level valid-conv minimum
    (needs a >=4 px bottleneck: ~188 px per side)."""
    from ..models.composites import OrigUNet_w_VITFLY_ViTLSTM

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
    return OrigUNet_w_VITFLY_ViTLSTM(
        num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
        enc_params=enc_params, fc_params=fc_params,
        input_shape=[1, 1, input_hw[0], input_hw[1]],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )


def dp_chunked_demo_step(
    n_devices: int,
    input_hw=(188, 196),
    B: int = 4,
    G: int = 8,
    chunks_per_device: int = 1,
):
    """Build + run ONE step of the PRODUCTION training path — chunk-level DP
    (make_dp_chunked_train_step, exactly what Learner._dp_train_epoch jits)
    — on an ``n_devices`` mesh with synthetic int8/uint8 device-resident
    data at tiny shapes.

    This is the multi-chip dry run's core: the flagship joint model, the
    quantized device-residency layout (train_policy.py trains with
    device_data_quantized=True), the on-device chunk gather, the padded-
    chunk guard (one chunk has n_valid=0, one is partial), and the
    XLA-inserted gradient psum over the 'data' axis.  G work items are fixed
    independently of the mesh so an ``n_devices`` run and a 1-device run
    (chunks_per_device=G) execute the identical optimizer step — callers
    assert their results match.

    Returns (loss_sum, values, gradnorm, n_real) as floats.
    """
    import numpy as np
    import jax.numpy as jnp

    from .mesh import make_mesh

    assert G % max(n_devices * chunks_per_device, 1) == 0
    model = _flagship_model(input_hw)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.masked(optax.adam(1e-4), {k: is_trainable_key(k) for k in params})
    opt_state = optimizer.init(params)

    mesh = make_mesh(n_devices)
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    H, W = input_hw
    rng = np.random.default_rng(0)
    n_frames, n_ev = 16, 14
    data = {
        # the Learner's quantized staging layout: B trailing pad rows,
        # uint8 depths in [0,1]/255 steps, int8 events in [-1,1]/127 steps
        "depths": jnp.asarray(rng.integers(0, 256, (n_frames + B, H, W)), jnp.uint8),
        "evs": jnp.asarray(rng.integers(-127, 128, (n_ev + B, H, W)), jnp.int8),
        "desvel": jnp.asarray(np.full(n_frames + B, 4.0), jnp.float32),
        "velcmd": jnp.asarray(rng.standard_normal((n_frames + B, 3)), jnp.float32),
    }
    data = jax.device_put(data, repl)

    step = make_dp_chunked_train_step(
        model, "joint_vitlstm", optimizer, mesh, B,
        num_in_channels=2, num_out_channels=1,
        loss_weights=[10.0, 1.0], optional_loss_param=[5.0, -1.0],
    )
    shard0 = NamedSharding(mesh, P("data"))
    starts = (rng.integers(0, n_frames - B, G)).astype(np.int32)
    ev_starts = (rng.integers(0, n_ev - B, G)).astype(np.int32)
    n_valids = np.full(G, B, np.int32)
    n_valids[G // 2] = max(B - 2, 1)   # partial chunk
    n_valids[G - 1] = 0                # padded chunk (guard must zero it)
    idxs = {
        "start": jax.device_put(jnp.asarray(starts), shard0),
        "ev_start": jax.device_put(jnp.asarray(ev_starts), shard0),
        "n_valid": jax.device_put(jnp.asarray(n_valids), shard0),
    }
    rngs = jax.device_put(jax.random.split(jax.random.PRNGKey(1), G), shard0)

    params, opt_state, loss_sum, values_sum, gradnorm, n_real = step(
        params, opt_state, data, idxs, rngs
    )
    jax.block_until_ready(loss_sum)
    return (
        float(loss_sum),
        [float(v) for v in values_sum],
        float(gradnorm),
        float(n_real),
    )


def dp_train_demo_step(n_devices: int, input_hw=(188, 196), batch: int = 8):
    """Build + run ONE data-parallel joint-model train step on tiny shapes.

    Frame-level DP demo: the full flagship training step (Adam, weighted
    two-term loss) on an ``n_devices`` DP mesh, one step.  The multi-chip
    dry run uses dp_chunked_demo_step (the production chunk-DP path); this
    stays as the minimal frame-DP example and test surface.
    """
    import numpy as np
    import jax.numpy as jnp

    from .mesh import make_mesh, replicate_params, shard_batch

    model = _flagship_model(input_hw)
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
