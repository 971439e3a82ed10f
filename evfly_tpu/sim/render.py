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


@functools.partial(jax.jit, static_argnames=("H", "W", "fov_deg", "max_depth", "is_trees"))
def render_rgbd_flow(
    cam_pos: jnp.ndarray,           # (3,) world position (x fwd, y left, z up)
    cam_vel: jnp.ndarray,           # (3,) world linear velocity
    cam_omega: jnp.ndarray,         # (3,) body angular velocity [rad/s]
    centers: jnp.ndarray,           # (K, 3) obstacle centers (padded ok)
    radii: jnp.ndarray,             # (K,) radii; 0 = inactive padding
    H: int = 260,
    W: int = 346,
    fov_deg: float = 70.0,
    max_depth: float = 20.0,
    is_trees: bool = False,
):
    """RGB + depth + optical flow — the full sensor channel set the
    reference's Unity camera publishes (rgb_camera.cpp:212+ enables RGB /
    depth / optical-flow layers; visionsim_node.cpp:223-262 republishes
    them).  Returns (rgb (H,W,3) in [0,1], depth (H,W) in [0,1],
    flow (H,W,2) in px/s).

    Design: the scene is analytic, so optical flow needs no second render —
    it is the exact ego-motion field.  For the scene point P = t·d hit by a
    pixel (camera frame: X fwd, Y left, Z up), a static world moves
    relative to the camera with dP/dt = -v - ω×P; projecting through
    u = -f·Y/X, v_img = -f·Z/X gives the pixel-rate field in closed form
    (the same equations Unity's motion-vector pass evaluates numerically).
    Sky pixels (no hit) get zero flow, matching the invalid-region zeroing
    in the reference's flow images.

    RGB: per-obstacle procedural tint (hue from the obstacle index) and a
    green-tinted ground checker, scaled so that the Rec.601 luminance of
    every pixel EXACTLY equals render_depth_intensity's grayscale — the
    difflog/event path and anything trained on grayscale are unchanged
    (tests/test_sim_render.py asserts the equality).
    """
    f = W / (2.0 * math.tan(math.radians(fov_deg) / 2.0))
    u = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    v = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    vv, uu = jnp.meshgrid(v, u, indexing="ij")
    dirs = jnp.stack([jnp.ones_like(uu), -uu / f, -vv / f], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    rel = centers - cam_pos[None, :]

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

    ts = jax.vmap(hit_one)(rel, radii)
    t_obj = jnp.min(ts, axis=0)
    hit_idx = jnp.argmin(ts, axis=0)
    dz = dirs[..., 2]
    t_ground = jnp.where(dz < -1e-5, -cam_pos[2] / dz, jnp.inf)
    t_min = jnp.minimum(t_obj, t_ground)
    ground_hit = t_ground < t_obj

    # ---- depth + grayscale: identical math to render_depth_intensity ----
    axial = t_min * dirs[..., 0]
    depth = jnp.clip(jnp.where(jnp.isfinite(axial), axial, max_depth) / max_depth, 0.0, 1.0)

    albedo = 0.25 + 0.35 * (jnp.sin(jnp.arange(centers.shape[0]) * 2.399) * 0.5 + 0.5)
    hit_z = cam_pos[2] + t_obj * dirs[..., 2]
    stripe = (jnp.sin(6.0 * hit_z) > 0).astype(jnp.float32)
    obj_int = albedo[hit_idx] * (0.55 + 0.45 * stripe) * jnp.exp(
        -jnp.clip(t_obj * dirs[..., 0], 0, max_depth) / (2.0 * max_depth)
    )
    gx = cam_pos[0] + t_ground * dirs[..., 0]
    gy = cam_pos[1] + t_ground * dirs[..., 1]
    checker = ((jnp.sin(4.2 * gx) * jnp.sin(3.4 * gy)) > 0).astype(jnp.float32)
    ground_int = (0.28 + 0.42 * checker) * jnp.exp(
        -jnp.clip(t_ground, 0, 4 * max_depth) / (4.0 * max_depth)
    )
    intensity = jnp.where(
        jnp.isfinite(t_min), jnp.where(ground_hit, ground_int, obj_int), 0.85
    )

    # ---- RGB: luminance-preserving tint (Rec.601 weights) ----
    lw = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    k = jnp.arange(centers.shape[0], dtype=jnp.float32)
    # per-obstacle hue: smooth procedural RGB, mixed 65% toward white so
    # that after luminance normalization (dot(lw, tint) == 1, hence
    # luminance(intensity * tint) == intensity) no channel can exceed 1
    # for any reachable intensity — i.e. the [0,1] clip below never bites
    # and the luminance-parity contract holds exactly
    obj_tint = 0.65 + 0.35 * jnp.stack([
        0.6 + 0.4 * jnp.sin(k * 1.7),
        0.6 + 0.4 * jnp.sin(k * 2.3 + 2.1),
        0.6 + 0.4 * jnp.sin(k * 3.1 + 4.2),
    ], axis=-1)
    obj_tint = obj_tint / (obj_tint @ lw)[:, None]
    ground_tint = jnp.array([0.85, 1.1, 0.8], jnp.float32)
    ground_tint = ground_tint / jnp.dot(ground_tint, lw)
    sky_tint = jnp.array([0.95, 1.0, 1.1], jnp.float32)
    sky_tint = sky_tint / jnp.dot(sky_tint, lw)

    tint = jnp.where(
        jnp.isfinite(t_min)[..., None],
        jnp.where(ground_hit[..., None], ground_tint[None, None, :],
                  obj_tint[hit_idx]),
        sky_tint[None, None, :],
    )
    rgb = jnp.clip(intensity[..., None] * tint, 0.0, 1.0)

    # ---- optical flow: exact ego-motion field ----
    # camera frame == world frame here (the analytic camera is axis-
    # aligned, like render_depth_intensity); P = t*d, dP/dt = -v - ω×P
    P = t_min[..., None] * dirs                          # (H, W, 3)
    Pdot = -cam_vel[None, None, :] - jnp.cross(
        jnp.broadcast_to(cam_omega, P.shape), P
    )
    X, Y, Z = P[..., 0], P[..., 1], P[..., 2]
    Xd, Yd, Zd = Pdot[..., 0], Pdot[..., 1], Pdot[..., 2]
    safe_X = jnp.where(jnp.isfinite(X) & (X > 1e-6), X, 1.0)
    # u = -f Y/X, v = -f Z/X  ->  du/dt, dv/dt (px/s)
    du = -f * (Yd * safe_X - Y * Xd) / (safe_X * safe_X)
    dv = -f * (Zd * safe_X - Z * Xd) / (safe_X * safe_X)
    valid = jnp.isfinite(t_min)[..., None]
    flow = jnp.where(valid, jnp.stack([du, dv], axis=-1), 0.0)

    return rgb, depth, flow
