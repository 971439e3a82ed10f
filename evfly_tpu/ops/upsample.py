"""Flow-based temporal frame upsampling — the Vid2E/SuperSloMo analog.

The reference raises the frame rate of rendered rollouts with the learned
SuperSloMo interpolator (rpg_vid2e ``upsample.py`` subprocess at
/root/reference/utils/to_events.py:146-165) before running the continuous
event simulator, so that event *timestamps* resolve motion finer than the
camera rate.  Vid2E picks the upsampling factor adaptively so the maximum
optical displacement between consecutive upsampled frames stays around one
pixel.

TPU-native counterpart: the analytic renderer already emits the *exact*
ego-motion optical flow field (sim/render.render_rgbd_flow — the quantity
SuperSloMo has to estimate), so intermediate frames come from closed-form
flow warping instead of a learned network:

    I_alpha(x) = (1-alpha) * I0(x - alpha*dt*F0(x))
               +    alpha  * I1(x + (1-alpha)*dt*F1(x))

(backward bilinear warps of both endpoint frames along their own flow
fields, blended by temporal proximity — SuperSloMo's eq. (1) with the
true flow substituted for the estimated one and without the learned
occlusion refinement).  The adaptive factor per frame pair is
ceil(max||F||*dt / max_disp), Vid2E's displacement rule.

Everything is jittable at a static factor K; the sequence-level driver
loops pairs on the host with per-pair adaptive K (offline data-gen path,
ragged output like the reference's upsampled image folders).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_bilinear(img: jnp.ndarray, xq: jnp.ndarray, yq: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of img (H, W) at float pixel coords (xq=col, yq=row).

    Border-clamped (replicate edge), matching cv2.remap BORDER_REPLICATE —
    the convention the calibration remap path already uses.
    """
    H, W = img.shape
    xq = jnp.clip(xq, 0.0, W - 1.0)
    yq = jnp.clip(yq, 0.0, H - 1.0)
    x0 = jnp.floor(xq).astype(jnp.int32)
    y0 = jnp.floor(yq).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = xq - x0.astype(xq.dtype)
    wy = yq - y0.astype(yq.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


@jax.jit
def warp_backward(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by a displacement field: out(x) = img(x + disp(x)).

    disp (H, W, 2) in pixels, channel 0 = x/col, channel 1 = y/row (the
    renderer's flow channel order).
    """
    H, W = img.shape
    disp = disp.astype(jnp.float32)  # f16 flows (h5 storage) would quantize
    # sample coordinates to ~0.25 px at x=346
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    return _sample_bilinear(img, xx + disp[..., 0], yy + disp[..., 1])


@functools.partial(jax.jit, static_argnames=("factor",))
def interp_pair(
    i0: jnp.ndarray,      # (H, W) intensity at t0
    i1: jnp.ndarray,      # (H, W) intensity at t1
    f0: jnp.ndarray,      # (H, W, 2) optical flow at t0 [px/s]
    f1: jnp.ndarray,      # (H, W, 2) optical flow at t1 [px/s]
    dt: float,
    factor: int,
) -> jnp.ndarray:
    """(factor-1, H, W) intermediate frames at alphas k/factor, k=1..factor-1."""
    if factor < 2:
        return jnp.zeros((0,) + i0.shape, i0.dtype)
    alphas = jnp.arange(1, factor, dtype=jnp.float32) / factor

    def one(alpha):
        w0 = warp_backward(i0, -alpha * dt * f0)
        w1 = warp_backward(i1, (1.0 - alpha) * dt * f1)
        return (1.0 - alpha) * w0 + alpha * w1

    return jax.vmap(one)(alphas)


def adaptive_factor(
    f0: np.ndarray, f1: np.ndarray, dt: float, max_disp: float = 1.0, max_factor: int = 16
) -> int:
    """Vid2E displacement rule: enough intermediate frames that the largest

    per-pixel displacement between consecutive (upsampled) frames is at most
    ``max_disp`` pixels.  Uses the larger endpoint flow as the pair's bound.
    """
    mag = 0.0
    for f in (f0, f1):
        if f is not None:
            m = float(np.max(np.hypot(np.asarray(f[..., 0]), np.asarray(f[..., 1]))))
            if not np.isfinite(m):
                # f16 h5 storage yields inf for grazing-obstacle flows
                # (f*|v|/X past 65504 px/s); NaN can't be ranked either —
                # saturate at the cap instead of raising/ignoring (note
                # python max() would silently DROP a nan here)
                return int(max_factor)
            mag = max(mag, m)
    # clip BEFORE the int(): int(ceil(inf)) raises OverflowError
    disp = min(mag * float(dt) / float(max_disp), float(max_factor))
    k = int(np.ceil(disp)) if disp > 0 else 1
    return int(np.clip(k, 1, max_factor))


def upsample_sequence(
    frames: np.ndarray,   # (T, H, W) intensity
    flows: np.ndarray,    # (T, H, W, 2) optical flow [px/s]
    t_frames: np.ndarray,  # (T,) timestamps [s]
    max_disp: float = 1.0,
    max_factor: int = 16,
    fixed_factor: int | None = None,
    return_factors: bool = False,
):
    """Upsampled (frames, timestamps[, per-pair factors]) with per-pair
    adaptive factors.

    Endpoint frames are kept verbatim (upsampled sequence contains the
    original frames at their original timestamps, like the reference's
    upsampled image folders, to_events.py:146-165).  ``fixed_factor``
    overrides the adaptive rule for every pair.
    """
    frames = np.asarray(frames, np.float32)
    flows = np.asarray(flows, np.float32)  # h5 stores flows as f16
    t_frames = np.asarray(t_frames, np.float64)
    out_frames: List[np.ndarray] = [frames[0]]
    out_ts: List[float] = [float(t_frames[0])]
    factors: List[int] = []
    for i in range(1, len(frames)):
        dt = float(t_frames[i] - t_frames[i - 1])
        k = (
            int(fixed_factor)
            if fixed_factor is not None
            else adaptive_factor(flows[i - 1], flows[i], dt, max_disp, max_factor)
        )
        factors.append(k)
        if k > 1:
            mids = np.asarray(
                interp_pair(
                    jnp.asarray(frames[i - 1]),
                    jnp.asarray(frames[i]),
                    jnp.asarray(flows[i - 1]),
                    jnp.asarray(flows[i]),
                    dt,
                    k,
                )
            )
            for j in range(k - 1):
                out_frames.append(mids[j])
                out_ts.append(float(t_frames[i - 1]) + (j + 1) / k * dt)
        out_frames.append(frames[i])
        out_ts.append(float(t_frames[i]))
    if return_factors:
        return np.stack(out_frames), np.asarray(out_ts), np.asarray(factors, np.int64)
    return np.stack(out_frames), np.asarray(out_ts)


def linear_log_upsample(frames: np.ndarray, factor: int, eps: float = 1e-10) -> np.ndarray:
    """No-warp linear-in-log cross-fade to a fixed fine grid —
    ((T-1)*factor + 1, H, W).

    This is the interpolation the plain ESIM scan implicitly assumes happens
    between frames (ops/esim.py linear-in-log), materialized so it can serve
    as the baseline against flow-warp upsampling in tests and
    tools/upsample_report.py (one shared implementation — the published
    artifact and the test must measure the same baseline).
    """
    frames = np.asarray(frames, np.float32)
    logs = np.log(frames.astype(np.float64) + eps)
    out = [frames[0]]
    for j in range(len(frames) - 1):
        for k in range(1, factor):
            a = k / factor
            out.append(np.exp((1 - a) * logs[j] + a * logs[j + 1]) - eps)
        out.append(frames[j + 1])
    return np.stack(out).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("factor",))
def upsample_fixed(
    frames: jnp.ndarray,  # (T, H, W)
    flows: jnp.ndarray,   # (T, H, W, 2)
    dt: float,
    factor: int,
) -> jnp.ndarray:
    """Fully jitted fixed-factor path: ((T-1)*factor + 1, H, W).

    vmapped over frame pairs — static shapes, one XLA program, for on-device
    batch data-gen where the adaptive host loop would dominate.
    """
    i0s, i1s = frames[:-1], frames[1:]
    f0s, f1s = flows[:-1], flows[1:]
    mids = jax.vmap(lambda a, b, c, d: interp_pair(a, b, c, d, dt, factor))(
        i0s, i1s, f0s, f1s
    )  # (T-1, factor-1, H, W)
    blocks = jnp.concatenate([i0s[:, None], mids], axis=1)  # (T-1, factor, H, W)
    flat = blocks.reshape((-1,) + frames.shape[1:])
    return jnp.concatenate([flat, frames[-1:]], axis=0)
