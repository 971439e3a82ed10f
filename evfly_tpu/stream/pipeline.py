"""Jitted streaming inference: sliding-window events → depth → velocity.

The reference deployment loop (evfly_ros/run.py:244-414) runs at 15 Hz on a
CPU: quantile-scale the event frame, forward the joint model with hidden
states carried across frames indefinitely, scale the velocity.  Here the
whole step — optional Pallas voxelization, 97th-percentile scaling, D(θ)
forward, V(φ) forward — is ONE jitted XLA program with the recurrent carry
donated, so steady-state latency is a single device dispatch with no
host↔device round-trips for state (north-star: <5 ms p50 event→command).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.common import Params
from ..ops.voxelizer import event_histogram


def _quantile_scale(frame: jnp.ndarray, do_events: bool = True, fast: bool = False) -> jnp.ndarray:
    """clip(frame / quantile(|frame|, 0.97), ±1) — run.py:250-253.

    fast=True uses the bisection percentile (ops/percentile.py) instead of
    the sort — recommended for serving; the exact sort is the parity path.
    """
    if fast:
        from ..ops.percentile import approx_abs_quantile

        q = approx_abs_quantile(frame[None], 0.97)[0]
    else:
        q = jnp.quantile(jnp.abs(frame), 0.97)
    q = jnp.where(q > 0, q, 1.0)
    lo = -1.0 if do_events else 0.0
    return jnp.clip(frame / q, lo, 1.0)


class StreamingPipeline:
    """Stateful streaming runner around a joint (or single) model.

    model must expose ``apply(params, [frame, desvel, h_unet_pair, h_vit])``
    with the composite hidden convention ((h_unet, h_velpred), h_vitlstm),
    and ``init_hidden()``.
    """

    def __init__(
        self,
        model,
        params: Params,
        desvel: float = 4.0,
        input_hw: Tuple[int, int] = (260, 346),
        quantile_scale: bool = True,
        fast_percentile: bool = False,
        int8_voxelize: bool = False,
    ):
        self.model = model
        self.params = params
        self.desvel = desvel
        self.input_hw = input_hw
        self.quantile_scale = quantile_scale
        self.fast_percentile = fast_percentile
        # int8 one-hot voxelizer matmuls: bit-identical counts at 2x the
        # MXU rate (ops/voxelizer._accumulate_subchunks); serving opt-in
        self.int8_voxelize = int8_voxelize
        self.hidden = model.init_hidden()

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _step(params, frame, hidden, desvel_arr):
            if self.quantile_scale:
                frame = _quantile_scale(frame, fast=self.fast_percentile)
            x = frame.reshape(1, 1, *self.input_hw)
            vel, (depth, _upconv, new_hidden), _updates = model.apply(
                params, [x, desvel_arr, hidden[0], hidden[1]], train=False
            )
            return vel[0], (depth[0, 0] if depth is not None else None), new_hidden

        self._step = _step

        H, W = input_hw

        @functools.partial(jax.jit, donate_argnums=(4,))
        def _step_events(params, ex, ey, ep, hidden, desvel_arr):
            frame = event_histogram(ex, ey, ep, H, W, int8_mm=self.int8_voxelize)
            if self.quantile_scale:
                frame = _quantile_scale(frame, fast=self.fast_percentile)
            x = frame.reshape(1, 1, H, W)
            vel, (depth, _upconv, new_hidden), _updates = model.apply(
                params, [x, desvel_arr, hidden[0], hidden[1]], train=False
            )
            return vel[0], (depth[0, 0] if depth is not None else None), new_hidden

        self._step_events = _step_events

    def reset(self):
        """Zero the recurrent carry (sim resets when pos.x < 0.5,
        run_competition.py:500-520; never in real deployment)."""
        self.hidden = self.model.init_hidden()

    def step_frame(self, frame: jnp.ndarray):
        """One event frame (H, W) float32 -> (velocity (3,), depth (H, W))."""
        desvel_arr = jnp.full((1, 1), self.desvel, jnp.float32)
        vel, depth, self.hidden = self._step(self.params, frame, self.hidden, desvel_arr)
        return vel * self.desvel, depth

    def step_events(self, ex: jnp.ndarray, ey: jnp.ndarray, ep: jnp.ndarray):
        """One window of raw events -> (velocity (3,), depth (H, W)).

        Voxelization (Pallas histogram) fuses into the same XLA program as
        the model forward.
        """
        desvel_arr = jnp.full((1, 1), self.desvel, jnp.float32)
        vel, depth, self.hidden = self._step_events(
            self.params, ex, ey, ep, self.hidden, desvel_arr
        )
        return vel * self.desvel, depth


class BatchedStreamingPipeline:
    """G independent event streams stepped in lockstep on one chip.

    The multi-stream serving path (BASELINE config 5): every stream carries
    its own recurrent state; one jitted step vmaps the per-stream forward
    over the stream axis, so G policies cost ~one batched dispatch instead
    of G sequential ones.  The reference has no analog — its scaling story
    is OpenMP-threaded sim envs (vec_env_base.cpp:124); here the streams
    share the MXU.

    Per-stream hidden reset is a mask argument (sim resets a stream when its
    quad re-enters pos.x < 0.5, run_competition.py:500-520), applied BEFORE
    the forward like ``StreamingPipeline.reset``.
    """

    def __init__(
        self,
        model,
        params: Params,
        num_streams: int,
        desvel=4.0,
        input_hw: Tuple[int, int] = (260, 346),
        quantile_scale: bool = True,
        fast_percentile: bool = False,
    ):
        self.model = model
        self.params = params
        self.G = num_streams
        self.input_hw = input_hw
        desvel = jnp.broadcast_to(jnp.asarray(desvel, jnp.float32), (num_streams,))
        self.desvel = desvel
        H, W = input_hw

        def one_stream(params, frame, dv, hidden):
            if quantile_scale:
                frame = _quantile_scale(frame, fast=fast_percentile)
            x = frame.reshape(1, 1, H, W)
            vel, (depth, _upconv, new_hidden), _updates = model.apply(
                params, [x, dv.reshape(1, 1), hidden[0], hidden[1]], train=False
            )
            return vel[0], (depth[0, 0] if depth is not None else jnp.zeros(())), new_hidden

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _step(params, frames, hidden, reset_mask):
            hidden = jax.tree_util.tree_map(
                lambda h: jnp.where(
                    reset_mask.reshape((num_streams,) + (1,) * (h.ndim - 1)), 0.0, h
                ),
                hidden,
            )
            vels, depths, new_hidden = jax.vmap(
                one_stream, in_axes=(None, 0, 0, 0)
            )(params, frames, desvel, hidden)
            return vels * desvel[:, None], depths, new_hidden

        self._step = _step
        self.hidden = self.init_hidden()

    def init_hidden(self):
        one = self.model.init_hidden()
        return jax.tree_util.tree_map(
            lambda h: jnp.broadcast_to(h, (self.G,) + h.shape), one
        )

    def reset(self):
        self.hidden = self.init_hidden()

    def step_frames(self, frames: jnp.ndarray, reset_mask=None):
        """frames (G, H, W) -> (velocities (G, 3) scaled by desvel, depths).

        ``reset_mask`` (G,) bool zeroes those streams' recurrent state before
        the forward.
        """
        if reset_mask is None:
            reset_mask = jnp.zeros((self.G,), bool)
        vels, depths, self.hidden = self._step(
            self.params, frames, self.hidden, jnp.asarray(reset_mask)
        )
        return vels, depths
