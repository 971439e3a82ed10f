"""RGB + optical-flow sensor channels (sim/render.render_rgbd_flow) vs the
reference Unity camera surface (rgb_camera.cpp:212+ enables RGB/depth/
optical-flow layers; visionsim_node.cpp:223-262 republishes them).

Flow correctness is checked two ways: analytic structure (focus of
expansion, depth scaling, sky zeroing) and a finite-difference oracle
(reproject the SAME world point after a small camera motion and compare
the pixel displacement rate)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from evfly_tpu.sim.render import render_depth_intensity, render_rgbd_flow

H, W = 64, 86
FOV = 70.0


@pytest.fixture(scope="module")
def scene():
    centers = jnp.asarray(
        [[6.0, 0.0, 2.0], [9.0, -2.5, 2.0], [14.0, 2.5, 2.0]], jnp.float32
    )
    radii = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    return centers, radii


def _render(scene, pos, vel=(4.0, 0.0, 0.0), omega=(0.0, 0.0, 0.0)):
    centers, radii = scene
    return render_rgbd_flow(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(omega, jnp.float32), centers, radii, H=H, W=W, fov_deg=FOV,
    )


def test_rgb_luminance_matches_grayscale(scene):
    """Rec.601 luminance of the RGB render equals render_depth_intensity's
    grayscale everywhere — the difflog/event path is unchanged by color."""
    centers, radii = scene
    pos = (0.0, 0.0, 2.0)
    rgb, depth, _flow = _render(scene, pos)
    d_ref, i_ref = render_depth_intensity(
        jnp.asarray(pos, jnp.float32), centers, radii, H=H, W=W, fov_deg=FOV
    )
    lum = np.asarray(rgb) @ np.array([0.299, 0.587, 0.114])
    np.testing.assert_allclose(lum, np.asarray(i_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(d_ref), atol=1e-7)
    # color is real: distinct obstacles get distinct chromaticity
    rgb = np.asarray(rgb)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    assert np.abs(rgb[..., 0] - rgb[..., 2]).max() > 0.05


def test_flow_focus_of_expansion(scene):
    """Pure forward translation: flow vanishes at the image center (the
    focus of expansion) and points radially OUTWARD everywhere else."""
    _rgb, _depth, flow = _render(scene, (0.0, 0.0, 2.0), vel=(4.0, 0.0, 0.0))
    flow = np.asarray(flow)
    cy, cx = (H - 1) // 2, (W - 1) // 2
    # even image sizes put the optical center half a pixel off this pixel:
    # expected residual ~ 0.5 px * vx / X ~= 0.4 px/s at X~5 m
    assert np.linalg.norm(flow[cy, cx]) < 1.0  # px/s, at 4 m/s
    # radial outwardness: flow . (pixel - center) >= 0 on valid pixels
    u = np.arange(W) - (W - 1) / 2.0
    v = np.arange(H) - (H - 1) / 2.0
    vv, uu = np.meshgrid(v, u, indexing="ij")
    rad = np.stack([uu, vv], -1)
    dots = (flow * rad).sum(-1)
    valid = np.linalg.norm(flow, axis=-1) > 1e-6
    assert (dots[valid] >= -1e-3).all()


def test_flow_scales_inverse_depth(scene):
    """Lateral translation: flow magnitude ~ f*v/X — the near obstacle
    moves faster across the image than the far one."""
    centers, radii = scene
    _rgb, depth, flow = _render(scene, (0.0, 0.0, 2.0), vel=(0.0, 1.0, 0.0))
    flow = np.asarray(flow)
    depth = np.asarray(depth)
    f = W / (2.0 * math.tan(math.radians(FOV) / 2.0))
    # sample a pixel on the near (X=6) and far (X=14) obstacle
    d_near, d_far = 6.0 - 1.0, 14.0 - 1.0  # front surfaces
    near_mask = np.abs(depth * 20.0 - d_near) < 0.5
    far_mask = np.abs(depth * 20.0 - d_far) < 0.5
    assert near_mask.any() and far_mask.any()
    m_near = np.abs(flow[near_mask][:, 0]).max()
    m_far = np.abs(flow[far_mask][:, 0]).max()
    # du = f*vy/X for pure +y translation at the epipole row
    assert m_near == pytest.approx(f * 1.0 / d_near, rel=0.15)
    assert m_far == pytest.approx(f * 1.0 / d_far, rel=0.15)


def test_flow_finite_difference_oracle(scene):
    """Analytic flow == numerical reprojection rate of the SAME world
    point under the camera motion (translation + body rotation)."""
    centers, radii = scene
    pos = np.array([0.0, 0.3, 2.1])
    vel = np.array([3.0, 0.7, -0.4])
    omega = np.array([0.05, -0.12, 0.2])
    _rgb, _depth, flow = _render(scene, pos, vel, omega)
    flow = np.asarray(flow)

    # rebuild ray geometry exactly as the renderer does
    f = W / (2.0 * math.tan(math.radians(FOV) / 2.0))
    u = np.arange(W) - (W - 1) / 2.0
    v = np.arange(H) - (H - 1) / 2.0
    vv, uu = np.meshgrid(v, u, indexing="ij")
    dirs = np.stack([np.ones_like(uu), -uu / f, -vv / f], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    # pick a few pixels that hit geometry (finite depth < sky)
    centers_np = np.asarray(centers)
    hits = []
    for (py, px) in [(H // 2, W // 2), (H // 2, W // 4), (2 * H // 3, W // 2)]:
        d = dirs[py, px]
        ts = []
        for c, r in zip(centers_np, np.asarray(radii)):
            rel = c - pos
            b = -2.0 * np.dot(d, rel)
            cq = np.dot(rel, rel) - r * r
            disc = b * b - 4 * cq
            if disc >= 0:
                t = (-b - np.sqrt(disc)) / 2.0
                if t > 1e-3:
                    ts.append(t)
        if d[2] < -1e-5:
            ts.append(-pos[2] / d[2])
        if ts:
            hits.append((py, px, min(ts)))
    assert len(hits) >= 2

    def project(P):
        return np.array([-f * P[1] / P[0], -f * P[2] / P[0]])

    def rot(w, dt):
        th = np.linalg.norm(w) * dt
        if th < 1e-12:
            return np.eye(3)
        a = np.asarray(w) / np.linalg.norm(w)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    dt = 1e-5
    for py, px, t in hits:
        Pw = pos + t * dirs[py, px]              # static world point
        P0 = Pw - pos                            # camera frame at t=0
        # body rotates by exp([w]x dt): camera-frame coords premultiply
        # by R^T; camera also translates by v*dt
        P1 = rot(omega, dt).T @ (Pw - (pos + vel * dt))
        fd = (project(P1) - project(P0)) / dt
        np.testing.assert_allclose(flow[py, px], fd, rtol=1e-3, atol=1e-2)


def test_sky_flow_zero_and_rotation_only(scene):
    """Sky pixels carry zero flow; pure yaw rotates the whole field
    horizontally (independent of depth)."""
    _rgb, depth, flow = _render(scene, (0.0, 0.0, 2.0), vel=(4.0, 0.0, 0.0))
    # true sky = no hit at all (top rows look up past every obstacle);
    # depth>=1 alone also catches GROUND beyond max_depth, which still has
    # finite geometry and hence nonzero flow
    sky_rows = np.asarray(flow)[:4]
    assert (np.asarray(depth)[:4] >= 1.0 - 1e-6).all()
    assert np.abs(sky_rows).max() == 0.0

    # pure yaw (omega_z): du ~ constant f*wz across depths at the center row
    _rgb, depth, flow = _render(
        scene, (0.0, 0.0, 2.0), vel=(0.0, 0.0, 0.0), omega=(0.0, 0.0, 0.5)
    )
    flow = np.asarray(flow)
    valid = np.asarray(depth) < 1.0 - 1e-6
    f = W / (2.0 * math.tan(math.radians(FOV) / 2.0))
    center_row = valid[H // 2]
    du = flow[H // 2, center_row, 0]
    assert du.size > 10
    # w x P with w=(0,0,wz): Pdot=(-wz*(-Y)... ) -> du = -f*wz*(1+(Y/X)^2);
    # at the center column Y~0 -> |du| ~ f*wz
    mid = np.argmin(np.abs(np.arange(W)[center_row] - W // 2))
    assert abs(du[mid]) == pytest.approx(f * 0.5, rel=0.05)
