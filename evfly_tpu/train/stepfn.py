"""Shared jitted step builders for the Learner and the data-parallel path.

Encapsulates the reference's per-model-type dispatch (learner.py:1047-1083)
— which outputs feed which loss term, which models zero the z velocity —
plus spectral-norm power iteration and batch-norm state threading, as pure
functions of (params, batch, rng) suitable for jit/pjit.

Padding is fully inert: the loss is exactly masked, recurrence is causal
so padded chunk tails never contaminate real frames, and the frame mask is
threaded into every model's BatchNorm so train-mode batch statistics (and
running-stat updates) are computed over valid frames only — a padded chunk
computes exactly what the reference's ragged (unpadded) chunk computes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.augment import augment_chunk
from ..models.common import Params, is_trainable_key
from ..ops.imageops import spectral_norm_power_iteration
from .losses import combined_loss


def apply_for_loss(model, kind: str, params, inp, desvel, train, rng, frame_mask=None):
    """Run the model per the reference dispatch; returns (pred_vel, pred_vision, updates).

    ``frame_mask`` (N,) marks valid frames of a padded chunk; it reaches
    every BatchNorm so train-mode statistics exclude padding.
    """
    if kind == "origunet":
        vel, (y_interp, _up, _h), updates = model.apply(
            params, [inp, desvel, None], train=train, rng=rng, frame_mask=frame_mask
        )
        return vel, y_interp, updates
    if kind == "vitfly":
        vel, _h, updates = model.apply(
            params, [inp, desvel, None, None], train=train, rng=rng, frame_mask=frame_mask
        )
        return vel.at[:, 2].set(0.0), None, updates
    if kind == "joint_vitlstm":
        vel, (depth, _up, _h), updates = model.apply(
            params, [inp, desvel, (None, None), None], train=train, rng=rng,
            frame_mask=frame_mask,
        )
        return vel.at[:, 2].set(0.0), depth, updates
    if kind == "joint_convnet":
        vel, (depth, _up, _h), updates = model.apply(
            params, [inp, desvel, (None, None), None], train=train, rng=rng,
            frame_mask=frame_mask,
        )
        return vel, depth, updates
    if kind == "convnet_velpred":
        vel, _h, updates = model.apply(
            params, [inp, desvel, None], train=train, rng=rng, frame_mask=frame_mask
        )
        return vel, None, updates
    raise ValueError(kind)


def make_forward_loss(
    model,
    kind: str,
    loss_weights: Optional[Sequence[float]],
    optional_loss_param: Optional[Sequence[float]],
    data_augmentation: bool = False,
    num_out_channels: int = 1,
    train: bool = True,
    input_frame_scale: float = 1.0,
) -> Callable:
    """batch = {input, desvel, gt_vel, gt_frames, mask} -> (loss, aux).

    ``input_frame_scale != 1`` maps inputs through clip(scale·x, 0, 1) — the
    V(φ)-pretraining transform matching the composite's clip(2·depth, 0, 1)
    hand-off (learner_models.py:634).
    """

    def forward_loss(params: Params, batch, rng):
        inp, desvel = batch["input"], batch["desvel"]
        if input_frame_scale != 1.0:
            inp = jnp.clip(inp * input_frame_scale, 0.0, 1.0)
        gt_norm_vel = batch["gt_vel"] / desvel
        gt_frames = batch["gt_frames"]
        mask = batch["mask"]
        if train and data_augmentation:
            rng, k_aug = jax.random.split(rng)
            inp, gt_norm_vel, gt_frames = augment_chunk(
                k_aug, inp, gt_norm_vel, gt_frames, num_out_channels
            )
        pred_vel, pred_vision, updates = apply_for_loss(
            model, kind, params, inp, desvel, train, rng,
            frame_mask=mask if train else None,
        )
        preds = [pred_vel, pred_vision if pred_vision is not None else jnp.zeros_like(gt_frames)]
        gt_norms = [gt_norm_vel, gt_frames]
        batch_loss, values = combined_loss(gt_norms, preds, mask, loss_weights, optional_loss_param)
        return batch_loss, (jnp.stack(values), updates, pred_vel, pred_vision)

    return forward_loss


def spectral_updates(params: Params) -> Params:
    """Power-iteration updates for every spectral-norm layer (train-forward parity)."""
    out: Params = {}
    for k in params:
        if k.endswith(".weight_orig"):
            base = k[: -len(".weight_orig")]
            u, v = spectral_norm_power_iteration(
                params[k], params[base + ".weight_u"], params[base + ".weight_v"]
            )
            out[base + ".weight_u"] = u
            out[base + ".weight_v"] = v
    return out


def make_batch_slicer(B: int, num_in_channels: int, num_out_channels: int):
    """Chunk gather on DEVICE from resident dataset arrays.

    data: {'depths' (N+B,H,W), 'evs' (M+B,H,W), 'desvel' (N+B,), 'velcmd'
    (N+B,3)} padded with B trailing zero frames so dynamic_slice never
    clamps; idx: {'start', 'ev_start', 'n_valid'} 0-d int32 arrays.

    Keeping the dataset on device and slicing inside jit removes the
    per-chunk host→device transfer entirely — both a throughput win and the
    workaround for the axon tunnel's transfer-buffer leak (staged host
    buffers from repeated device_put are never freed; a training epoch was
    leaking ~9 GB host RSS before this).
    """
    from jax import lax as _lax

    def _decode(a):
        """bf16 -> f32 cast, or int8/uint8 dequantization (the quantized
        device-residency path; see Learner._get_device_data)."""
        if a.dtype == jnp.int8:
            return a.astype(jnp.float32) / 127.0
        if a.dtype == jnp.uint8:
            return a.astype(jnp.float32) / 255.0
        return a.astype(jnp.float32)

    def get_batch(data, idx):
        if num_in_channels == 2:
            inp = _lax.dynamic_slice_in_dim(data["evs"], idx["ev_start"], B, 0)[:, None]
        else:
            inp = _lax.dynamic_slice_in_dim(data["depths"], idx["start"], B, 0)[:, None]
        if num_out_channels == 2:
            gt_frames = _lax.dynamic_slice_in_dim(data["evs"], idx["ev_start"], B, 0)[:, None]
        else:
            gt_frames = _lax.dynamic_slice_in_dim(data["depths"], idx["start"], B, 0)[:, None]
        inp = _decode(inp)
        gt_frames = _decode(gt_frames)
        desvel = _lax.dynamic_slice_in_dim(data["desvel"], idx["start"], B, 0)[:, None]
        gt_vel = _lax.dynamic_slice_in_dim(data["velcmd"], idx["start"], B, 0)
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0] < idx["n_valid"]
        ).astype(jnp.float32)
        desvel = jnp.where(mask[:, None] > 0, desvel, 1.0)  # guard gt/desvel
        return {"input": inp, "desvel": desvel, "gt_vel": gt_vel,
                "gt_frames": gt_frames, "mask": mask}

    return get_batch


def make_train_step(model, kind, optimizer, loss_weights, optional_loss_param,
                    data_augmentation=False, num_out_channels=1, batch_fn=None,
                    input_frame_scale=1.0):
    """(params, opt_state, batch, rng) -> (params, opt_state, loss, values, gradnorm).

    Pure function — jit (single chip) or jit-with-shardings (DP mesh) at the
    call site.  With ``batch_fn`` the step takes (params, opt_state, data,
    idx, rng) and gathers the chunk on device (see make_batch_slicer).
    """
    forward_loss = make_forward_loss(
        model, kind, loss_weights, optional_loss_param,
        data_augmentation, num_out_channels, train=True,
        input_frame_scale=input_frame_scale,
    )

    def step(params, opt_state, batch, rng):
        params = {**params, **spectral_updates(params)}
        # differentiate only trainable float leaves: running stats /
        # counters / spectral u,v are state, not weights (and ints break grad)
        diff = {k: v for k, v in params.items() if is_trainable_key(k)}
        nondiff = {k: v for k, v in params.items() if not is_trainable_key(k)}

        def loss_fn(diff_params):
            return forward_loss({**diff_params, **nondiff}, batch, rng)

        (batch_loss, (values, updates, _pv, _pd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(diff)
        gradnorm = optax.global_norm(grads)
        grads_full = {**{k: jnp.zeros_like(v) for k, v in nondiff.items()}, **grads}
        opt_updates, opt_state = optimizer.update(grads_full, opt_state, params)
        params = optax.apply_updates(params, opt_updates)
        params = {**params, **updates}
        return params, opt_state, batch_loss, values, gradnorm

    if batch_fn is None:
        return step

    def indexed_step(params, opt_state, data, idx, rng):
        return step(params, opt_state, batch_fn(data, idx), rng)

    return indexed_step


def make_scanned_traj_step(model, kind, optimizer, loss_weights, optional_loss_param,
                           data_augmentation=False, num_out_channels=1,
                           num_in_channels=2, B=32, input_frame_scale=1.0):
    """One jitted dispatch per TRAJECTORY: lax.scan over its chunk steps.

    The per-chunk path costs a synchronous host round-trip per chunk to read
    the loss (the axon tunnel charges ~30-100 ms each), which dominated
    round-1 epoch time.  Scanning the chunk loop on device — Adam update and
    all — reduces host syncs from chunks/epoch to trajectories/epoch.  LR is
    constant within a trajectory by reference semantics (learner.py:718-720
    updates LR once per trajectory iteration).

    idxs: {'start','ev_start','n_valid'} each (C,) int32, padded to a stable
    C with n_valid == 0 entries; padded chunks are lax.cond-skipped so the
    optimizer state never sees them (an Adam step on zero grads is NOT a
    no-op).  Returns (params, opt_state, loss_sum, values_sum, gradnorm_mean).
    """
    step = make_train_step(
        model, kind, optimizer, loss_weights, optional_loss_param,
        data_augmentation, num_out_channels,
        batch_fn=make_batch_slicer(B, num_in_channels, num_out_channels),
        input_frame_scale=input_frame_scale,
    )

    def traj_step(params, opt_state, data, idxs, rng):
        C = idxs["start"].shape[0]
        rngs = jax.random.split(rng, C)
        n_values = 2  # velocity + vision terms (combined_loss layout)

        def body(carry, x):
            idx, k = x

            def do(carry):
                params, opt_state = carry
                params, opt_state, loss, values, gn = step(params, opt_state, data, idx, k)
                return (params, opt_state), (loss, values, gn)

            def skip(carry):
                return carry, (
                    jnp.zeros(()), jnp.zeros((n_values,)), jnp.zeros(()),
                )

            return jax.lax.cond(idx["n_valid"] > 0, do, skip, carry)

        (params, opt_state), (losses, values, gns) = jax.lax.scan(
            body, (params, opt_state), (idxs, rngs)
        )
        n_real = jnp.maximum((idxs["n_valid"] > 0).sum(), 1)
        return params, opt_state, losses.sum(), values.sum(0), gns.sum() / n_real

    return traj_step


def make_epoch_train_step(model, kind, optimizer, loss_weights, optional_loss_param,
                          data_augmentation=False, num_out_channels=1,
                          num_in_channels=2, B=32, input_frame_scale=1.0,
                          lr0=1e-4, warm_iters=0, lr_decay=False,
                          decay_denom=1.0):
    """One jitted dispatch per EPOCH: scan over trajectories, each an inner
    scan over chunk steps.

    The per-trajectory dispatch still costs ~0.9 s on the tunnel (large
    cached programs ship args per call); at 140 trajectories that is the
    whole epoch.  Here the trajectory loop moves on device too, including
    the reference's per-trajectory LR schedule (learner.py:622-630 computed
    in jnp from the iteration counter), so an epoch is ONE dispatch + ONE
    sync.

    Signature: (params, opt_state, data, idxs, rngs, its) ->
    (params, opt_state, losses (T,), values (T, n_terms), gradnorms (T,))
    with idxs {'start','ev_start','n_valid'} each (T, C) int32, rngs (T, 2),
    its (T,) int32 the per-trajectory total_its counters (the caller owns the
    numbering, so a GROUP of trajectories — a slice of the epoch padded to a
    fixed T, see Learner cfg.scan_group — reuses this same program: bounded
    per-dispatch device runtime with epoch-scan dispatch economics).
    """
    step = make_train_step(
        model, kind, optimizer, loss_weights, optional_loss_param,
        data_augmentation, num_out_channels,
        batch_fn=make_batch_slicer(B, num_in_channels, num_out_channels),
        input_frame_scale=input_frame_scale,
    )
    n_values = 2

    def lr_at(it):
        it = it.astype(jnp.float32)
        warm = (0.9 * lr0) / max(warm_iters, 1) * it + 0.1 * lr0
        decayed = lr0 * jnp.where(
            jnp.asarray(lr_decay),
            0.1 ** ((it - warm_iters) / decay_denom),
            1.0,
        )
        return jnp.where(it < warm_iters, warm, decayed)

    def epoch_step(params, opt_state, data, idxs, rngs, its):
        def chunk_body(carry, x):
            idx, k = x

            def do(carry):
                params, opt_state = carry
                params, opt_state, loss, values, gn = step(params, opt_state, data, idx, k)
                return (params, opt_state), (loss, values, gn)

            def skip(carry):
                return carry, (jnp.zeros(()), jnp.zeros((n_values,)), jnp.zeros(()))

            return jax.lax.cond(idx["n_valid"] > 0, do, skip, carry)

        def traj_body(carry, x):
            params, opt_state = carry
            idxs_t, rng, it = x
            hp = dict(opt_state.hyperparams)
            hp["learning_rate"] = lr_at(it)
            opt_state = opt_state._replace(hyperparams=hp)
            C = idxs_t["start"].shape[0]
            ks = jax.random.split(rng, C)
            (params, opt_state), (losses, values, gns) = jax.lax.scan(
                chunk_body, (params, opt_state), (idxs_t, ks)
            )
            n_real = jnp.maximum((idxs_t["n_valid"] > 0).sum(), 1)
            return (params, opt_state), (losses.sum(), values.sum(0), gns.sum() / n_real)

        (params, opt_state), (losses, values, gns) = jax.lax.scan(
            traj_body, (params, opt_state), (idxs, rngs, its)
        )
        return params, opt_state, losses, values, gns

    return epoch_step


def make_epoch_eval_step(model, kind, loss_weights, optional_loss_param,
                         num_out_channels=1, num_in_channels=2, B=32,
                         input_frame_scale=1.0):
    """Whole validation epoch as one dispatch: scan over (T, C) chunk index
    arrays, masked-skip padding, no prediction outputs (the plotting paths
    keep run_model's per-chunk variant).  Returns (losses (T,), values
    (T, n_terms))."""
    forward_loss = make_forward_loss(
        model, kind, loss_weights, optional_loss_param,
        data_augmentation=False, num_out_channels=num_out_channels, train=False,
        input_frame_scale=input_frame_scale,
    )
    batch_fn = make_batch_slicer(B, num_in_channels, num_out_channels)
    n_values = 2

    def epoch_eval(params, data, idxs, rngs):
        def chunk_body(_, x):
            idx, k = x

            def do(_):
                loss, (values, _u, _pv, _pd) = forward_loss(params, batch_fn(data, idx), k)
                return (), (loss, values)

            def skip(_):
                return (), (jnp.zeros(()), jnp.zeros((n_values,)))

            return jax.lax.cond(idx["n_valid"] > 0, do, skip, ())

        def traj_body(_, x):
            idxs_t, rng = x
            C = idxs_t["start"].shape[0]
            ks = jax.random.split(rng, C)
            _, (losses, values) = jax.lax.scan(chunk_body, (), (idxs_t, ks))
            return (), (losses.sum(), values.sum(0))

        _, (losses, values) = jax.lax.scan(traj_body, (), (idxs, rngs))
        return losses, values

    return epoch_eval


def make_eval_step(model, kind, loss_weights, optional_loss_param, num_out_channels=1,
                   batch_fn=None, input_frame_scale=1.0):
    forward_loss = make_forward_loss(
        model, kind, loss_weights, optional_loss_param,
        data_augmentation=False, num_out_channels=num_out_channels, train=False,
        input_frame_scale=input_frame_scale,
    )

    def step(params, batch, rng):
        batch_loss, (values, _updates, pred_vel, pred_vision) = forward_loss(params, batch, rng)
        return batch_loss, values, pred_vel, pred_vision

    if batch_fn is None:
        return step

    def indexed_step(params, data, idx, rng):
        return step(params, batch_fn(data, idx), rng)

    return indexed_step
