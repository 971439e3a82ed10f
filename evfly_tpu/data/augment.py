"""Data augmentation as a single jittable kernel (learner.py:862-918 parity).

The reference augments each training chunk with p-gated transforms:

* p=0.1 roll rotation ±20° followed by the largest-valid-crop resize back to
  the original size (learner.py:868-876, ``calculate_valid_crop_size`` :803),
* p=0.1 horizontal flip with y-velocity negation (:890-893),
* p=0.2 event scale jitter ×U(0.25, 4) with ±1 clamp (:898-904),
* p=0.1 tiny Gaussian noise (σ=1e-5) (:907-909),
* p=0.1 per-frame polarity flip (:911-916).

TPU-native divergence (documented): the reference composes NEAREST rotation
+ dynamic center-crop + bilinear resize as three host ops with data-dependent
crop shapes.  Under XLA we fuse rotation and valid-crop-zoom into ONE static-
shape bilinear affine warp — same geometry, one pass, jit/vmap friendly.
Gates use lax.cond on jax-random draws; probabilities and parameter ranges
match the reference exactly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _affine_rotate_zoom(img: jnp.ndarray, angle_rad: jnp.ndarray, zoom: jnp.ndarray) -> jnp.ndarray:
    """Rotate by angle about center and zoom in (valid-crop-resize), bilinear.

    img: (N, C, H, W).  zoom <= 1 selects the centered (zoom*H, zoom*W)
    region and scales it back up to (H, W).
    """
    N, C, H, W = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32) - cy
    xs = jnp.arange(W, dtype=jnp.float32) - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    # output pixel -> source coordinate: zoom then rotate by -angle
    sx = (xx * cos - yy * sin) * zoom + cx
    sy = (xx * sin + yy * cos) * zoom + cy

    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(sx - x0, 0.0, 1.0)
    wy = jnp.clip(sy - y0, 0.0, 1.0)

    flat = img.reshape(N * C, H, W)
    g = lambda yi, xi: flat[:, yi, xi]  # (N*C, H, W) gathered per output pixel
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )
    return out.reshape(N, C, H, W)


def _valid_zoom(angle_rad: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Largest centered axis-aligned crop scale valid after rotation
    (learner.py:803-820)."""
    c, s = jnp.abs(jnp.cos(angle_rad)), jnp.abs(jnp.sin(angle_rad))
    rot_w = W * c + H * s
    rot_h = W * s + H * c
    crop_w = W * H / rot_h
    crop_h = W * H / rot_w
    return jnp.maximum(crop_w / W, crop_h / H)


def augment_chunk(
    rng: jax.Array,
    inputs: jnp.ndarray,          # (N, 1, H, W) event frames
    gts_vels: jnp.ndarray,        # (N, 3)
    gts: jnp.ndarray,             # (N, 1, H, W) depth (or evs) ground truth
    num_out_channels: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the reference's augmentation pipeline to one chunk (jittable)."""
    k_rot_gate, k_rot, k_flip, k_scale_gate, k_scale, k_noise_gate, k_noise, k_pol_gate, k_pol = (
        jax.random.split(rng, 9)
    )
    H, W = inputs.shape[-2], inputs.shape[-1]

    # roll rotation + valid-crop zoom
    def do_rot(args):
        inp, g = args
        angle_deg = jax.random.uniform(k_rot, (), minval=-20.0, maxval=20.0)
        # reference converts with 3.14/180 (learner.py:874) for the crop calc
        angle = angle_deg * math.pi / 180.0
        zoom = _valid_zoom(angle_deg * 3.14 / 180.0, W, H)
        return (
            _affine_rotate_zoom(inp, angle, zoom),
            _affine_rotate_zoom(g, angle, zoom),
        )

    gate = jax.random.uniform(k_rot_gate) < 0.1
    inputs, gts = lax.cond(gate, do_rot, lambda a: a, (inputs, gts))

    # horizontal flip (+ y velocity negation)
    flip_gate = jax.random.uniform(k_flip) < 0.1
    inputs = jnp.where(flip_gate, jnp.flip(inputs, axis=-1), inputs)
    gts = jnp.where(flip_gate, jnp.flip(gts, axis=-1), gts)
    gts_vels = gts_vels.at[:, 1].multiply(jnp.where(flip_gate, -1.0, 1.0))

    # event scale jitter
    scale_gate = jax.random.uniform(k_scale_gate) < 0.2
    scale = jnp.where(scale_gate, jax.random.uniform(k_scale, (), minval=0.25, maxval=4.0), 1.0)
    inputs = jnp.where(scale_gate, jnp.clip(inputs * scale, -1.0, 1.0), inputs)
    if num_out_channels == 2:
        gts = jnp.where(scale_gate, jnp.clip(gts * scale, -1.0, 1.0), gts)

    # tiny gaussian noise
    noise_gate = jax.random.uniform(k_noise_gate) < 0.1
    noise = jax.random.normal(k_noise, inputs.shape) * 1e-5
    inputs = jnp.where(noise_gate, inputs + noise, inputs)

    # per-frame polarity flip
    pol_gate = jax.random.uniform(k_pol_gate) < 0.1
    signs = jax.random.choice(k_pol, jnp.array([-1.0, 1.0]), (inputs.shape[0], 1, 1, 1))
    inputs = jnp.where(pol_gate, inputs * signs, inputs)
    if num_out_channels == 2:
        gts = jnp.where(pol_gate, gts * signs, gts)

    return inputs, gts_vels, gts
