"""ESIM-style event simulation from image sequences, as a lax.scan.

The reference generates training events with the external CUDA
``esim_torch`` after SuperSloMo frame upsampling (utils/to_events.py:188-244,
thresholds ±0.2, refractory 0.5e6 ns), then accumulates per-inter-frame
windows into frames (:400-412).  TPU-native counterpart: the ESIM contrast
model — a pixel emits an event each time log-intensity crosses a multiple of
the threshold from a per-pixel reference level — evaluated directly on the
frame sequence with linear-in-log interpolation between frames (replacing
learned SuperSloMo interpolation; documented divergence) and carried
reference levels, all inside one lax.scan.  Output is the per-window signed
event-count frame × threshold — the exact tensor the voxelizer produces
from a discrete event list of the same crossings.

A generator variant materializes discrete (t, x, y, p) events per window for
testing the Pallas voxelizer against the frame path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("pos_thresh", "neg_thresh"))
def esim_event_frames(
    frames: jnp.ndarray,       # (T, H, W) intensity in [0, 1]
    pos_thresh: float = 0.2,
    neg_thresh: float = 0.2,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """(T-1, H, W) event frames: signed threshold-crossing counts × threshold.

    Carries the per-pixel reference log level across windows, so a slow ramp
    spread over many frames emits each crossing exactly once (matching the
    integrating behavior of the continuous simulator, unlike plain difflog
    which re-quantizes every frame pair independently).
    """
    logs = jnp.log(frames.astype(jnp.float32) + eps)

    def step(ref_level, log_t):
        delta = log_t - ref_level
        pos_events = jnp.floor(jnp.maximum(delta, 0.0) / pos_thresh)
        neg_events = jnp.floor(jnp.maximum(-delta, 0.0) / neg_thresh)
        frame = pos_thresh * pos_events - neg_thresh * neg_events
        new_ref = ref_level + frame  # reference advances by emitted quanta
        return new_ref, frame

    _, out = lax.scan(step, logs[0], logs[1:])
    return out


@functools.partial(jax.jit, static_argnames=("pos_thresh", "neg_thresh"))
def _esim_block(ref_level, block, pos_thresh: float, neg_thresh: float, eps: float = 1e-10):
    """ESIM scan over one block of frames from a carried reference level.

    Returns (signed window sum over the block, final reference level) — the
    carry that lets a long sequence be processed block-by-block without ever
    materializing it whole.
    """
    logs = jnp.log(block.astype(jnp.float32) + eps)

    def step(ref, log_t):
        delta = log_t - ref
        pos_events = jnp.floor(jnp.maximum(delta, 0.0) / pos_thresh)
        neg_events = jnp.floor(jnp.maximum(-delta, 0.0) / neg_thresh)
        frame = pos_thresh * pos_events - neg_thresh * neg_events
        return ref + frame, frame

    ref_end, out = lax.scan(step, ref_level, logs)
    return out.sum(axis=0), ref_end


def esim_event_frames_upsampled(
    frames,            # (T, H, W) intensity in [0, 1]
    flows,             # (T, H, W, 2) optical flow [px/s]
    t_frames,          # (T,) timestamps [s]
    pos_thresh: float = 0.2,
    neg_thresh: float = 0.2,
    max_disp: float = 1.0,
    max_factor: int = 16,
    fixed_factor=None,
    eps: float = 1e-10,
):
    """(T-1, H, W) event frames from flow-upsampled ESIM — the full Vid2E
    analog (SuperSloMo upsample → esim_torch → per-inter-frame windows,
    utils/to_events.py:146-244,400-412).

    Each frame pair is temporally upsampled by flow warping (ops/upsample.py,
    adaptive per-pair factor from the Vid2E displacement rule), the ESIM
    contrast scan runs over the pair's fine block with the per-pixel
    reference level CARRIED across pairs, and the block's signed sum is the
    pair's output window (the training schema).  Streaming per pair keeps
    peak memory at O(max_factor·H·W) — the full upsampled sequence (up to
    16× the input) is never materialized — and the jit cache sees at most
    ``max_factor`` distinct block shapes.  Each output window's signed sum
    telescopes to the plain ESIM value; what the upsampling improves is the
    *sub-window* crossing placement — which matters exactly when this is
    used with finer output windows or discrete event lists.
    """
    import numpy as np

    from .upsample import adaptive_factor, interp_pair

    frames = np.asarray(frames, np.float32)
    flows = np.asarray(flows, np.float32)
    t_frames = np.asarray(t_frames, np.float64)
    T = len(frames)
    out = np.empty((T - 1,) + frames.shape[1:], np.float32)
    ref = jnp.log(jnp.asarray(frames[0]) + eps)
    for i in range(1, T):
        dt = float(t_frames[i] - t_frames[i - 1])
        k = (
            int(fixed_factor)
            if fixed_factor is not None
            else adaptive_factor(flows[i - 1], flows[i], dt, max_disp, max_factor)
        )
        if k > 1:
            mids = interp_pair(
                jnp.asarray(frames[i - 1]), jnp.asarray(frames[i]),
                jnp.asarray(flows[i - 1]), jnp.asarray(flows[i]), dt, k,
            )
            block = jnp.concatenate([mids, jnp.asarray(frames[i])[None]], axis=0)
        else:
            block = jnp.asarray(frames[i])[None]
        win, ref = _esim_block(ref, block, pos_thresh, neg_thresh, eps)
        out[i - 1] = np.asarray(win)
    return out


def esim_events_list(
    frames, t_frames, pos_thresh: float = 0.2, neg_thresh: float = 0.2, eps: float = 1e-10
):
    """Host-side discrete event generation (voxelizer / streaming input).

    Returns (t, x, y, p) numpy arrays sorted by timestamp; event timestamps
    linearly interpolated within each inter-frame interval in crossing order
    — the output shape of the reference's esim_torch
    (/root/reference/utils/to_events.py:198-244), minus the refractory
    period (documented divergence; events here come from frame-pair
    crossings, which cannot re-fire within a window).  Fully vectorized
    (np.repeat over per-pixel counts): dataset-scale trajectories take
    milliseconds per window instead of a Python loop per event.
    """
    import numpy as np

    frames = np.asarray(frames, np.float64)
    t_frames = np.asarray(t_frames, np.float64)
    logs = np.log(frames + eps)
    ref = logs[0].copy()
    ts_l, xs_l, ys_l, ps_l = [], [], [], []
    for i in range(1, len(frames)):
        delta = logs[i] - ref
        n_pos = np.floor(np.maximum(delta, 0) / pos_thresh).astype(np.int64)
        n_neg = np.floor(np.maximum(-delta, 0) / neg_thresh).astype(np.int64)
        ref += pos_thresh * n_pos - neg_thresh * n_neg
        signed = n_pos - n_neg  # at most one of the two is nonzero per pixel
        cnt = np.abs(signed)
        if cnt.sum() == 0:
            continue
        yy, xx = np.nonzero(cnt)
        c = cnt[yy, xx]
        pix = np.repeat(np.arange(len(c)), c)          # active-pixel id per event
        # 0..c-1 within each pixel's run of events
        k = np.arange(len(pix)) - np.repeat(np.cumsum(c) - c, c)
        frac = (k + 1) / (c[pix] + 1)                  # spread uniformly in the interval
        ts_l.append(t_frames[i - 1] + frac * (t_frames[i] - t_frames[i - 1]))
        xs_l.append(xx[pix].astype(np.float64))
        ys_l.append(yy[pix].astype(np.float64))
        ps_l.append(np.sign(signed[yy, xx])[pix].astype(np.int32))
    if not ts_l:
        z = np.array([], np.float64)
        return z, z.copy(), z.copy(), np.array([], np.int32)
    ts = np.concatenate(ts_l)
    order = np.argsort(ts, kind="stable")
    return (
        ts[order],
        np.concatenate(xs_l)[order],
        np.concatenate(ys_l)[order],
        np.concatenate(ps_l)[order],
    )
