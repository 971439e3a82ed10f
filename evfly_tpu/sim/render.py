"""Analytic depth/intensity rendering — the TPU-native stand-in for Unity.

The reference renders RGB + depth through Flightmare's ZMQ bridge to a Unity
binary (unity_bridge.cpp:110-328) at 346×260 with a 70° FOV camera
(flightpy/configs/vision/config.yaml).  Here the scene — spheres and
z-infinite tree cylinders — is rendered analytically: one jitted ray-cast
over the pixel grid, vmap over obstacles, min-reduced.  This keeps the whole
closed loop (render → difflog events → policy → dynamics) inside XLA, and
batches across parallel environments with another vmap — the TPU-native
replacement for the OpenMP vectorized envs (vec_env_base.cpp:124).

Depth is metric distance along the camera axis normalized by ``max_depth``
into [0, 1] (matching the [0,1] depth-png contract the learner consumes,
rescale_depth=1.0 in the shipped configs).  Intensity is a flat-shaded
grayscale with depth attenuation + per-obstacle albedo — enough texture for
the difflog event approximation, which responds to moving edges.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("H", "W", "fov_deg", "max_depth", "is_trees"))
def render_depth_intensity(
    cam_pos: jnp.ndarray,           # (3,) world position (x fwd, y left, z up)
    centers: jnp.ndarray,           # (K, 3) obstacle centers (padded ok)
    radii: jnp.ndarray,             # (K,) radii; 0 = inactive padding
    H: int = 260,
    W: int = 346,
    fov_deg: float = 70.0,
    max_depth: float = 20.0,
    is_trees: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (depth in [0,1], intensity in [0,1]), each (H, W)."""
    f = W / (2.0 * math.tan(math.radians(fov_deg) / 2.0))
    u = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    v = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    vv, uu = jnp.meshgrid(v, u, indexing="ij")
    # camera axis +x; image right -> -y; image down -> -z
    dirs = jnp.stack([jnp.ones_like(uu), -uu / f, -vv / f], axis=-1)  # (H, W, 3)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    rel = centers - cam_pos[None, :]  # (K, 3)

    def hit_one(center, radius):
        if is_trees:
            d2 = dirs[..., :2]
            c2 = center[:2]
            a = jnp.sum(d2 * d2, axis=-1)
            b = -2.0 * jnp.sum(d2 * c2, axis=-1)
            c = jnp.sum(c2 * c2) - radius**2
        else:
            a = 1.0
            b = -2.0 * jnp.sum(dirs * center, axis=-1)
            c = jnp.sum(center * center) - radius**2
        disc = b * b - 4.0 * a * c
        t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a)
        valid = (disc >= 0.0) & (t > 1e-3) & (radius > 0.0)
        return jnp.where(valid, t, jnp.inf)

    ts = jax.vmap(hit_one)(rel, radii)           # (K, H, W)
    t_obj = jnp.min(ts, axis=0)
    hit_idx = jnp.argmin(ts, axis=0)

    # ground plane z = 0 with procedural texture: dense difflog events under
    # ego-motion, like the textured terrain in the reference's Unity scenes
    dz = dirs[..., 2]
    t_ground = jnp.where(dz < -1e-5, -cam_pos[2] / dz, jnp.inf)
    t_min = jnp.minimum(t_obj, t_ground)
    ground_hit = t_ground < t_obj

    # metric axial depth (distance along camera axis = t * dir_x)
    axial = t_min * dirs[..., 0]
    depth = jnp.clip(jnp.where(jnp.isfinite(axial), axial, max_depth) / max_depth, 0.0, 1.0)

    # per-obstacle albedo + hard stripe texture: difflog only fires on edges
    # crossing its ±0.2 log threshold, so textures must be high-contrast steps
    albedo = 0.25 + 0.35 * (jnp.sin(jnp.arange(centers.shape[0]) * 2.399) * 0.5 + 0.5)
    hit_z = cam_pos[2] + t_obj * dirs[..., 2]
    stripe = (jnp.sin(6.0 * hit_z) > 0).astype(jnp.float32)
    obj_int = albedo[hit_idx] * (0.55 + 0.45 * stripe) * jnp.exp(
        -jnp.clip(t_obj * dirs[..., 0], 0, max_depth) / (2.0 * max_depth)
    )
    # ground: world-anchored checker — sweeping edges fire dense events
    gx = cam_pos[0] + t_ground * dirs[..., 0]
    gy = cam_pos[1] + t_ground * dirs[..., 1]
    checker = ((jnp.sin(4.2 * gx) * jnp.sin(3.4 * gy)) > 0).astype(jnp.float32)
    ground_int = (0.28 + 0.42 * checker) * jnp.exp(
        -jnp.clip(t_ground, 0, 4 * max_depth) / (4.0 * max_depth)
    )

    intensity = jnp.where(
        jnp.isfinite(t_min),
        jnp.where(ground_hit, ground_int, obj_int),
        0.85,
    )
    return depth, intensity


def render_batch(cam_positions, centers, radii, **kw):
    """vmap over parallel environments / timesteps."""
    return jax.vmap(lambda p: render_depth_intensity(p, centers, radii, **kw))(cam_positions)
