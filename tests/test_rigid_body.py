"""Rigid-body dynamics + geometric controller (sim/rigid_body.py).

Mirrors the reference's own gtest property style
(flightmare/flightlib/tests/dynamics/quadrotor_dynamics.cpp): hover
derivative is zero, random states stay finite, plus closed-loop tracking
properties for the full velocity-command stack."""

import numpy as np
import pytest

from evfly_tpu.sim.rigid_body import (
    G,
    GeoControllerParams,
    QuadrotorParams,
    RigidBodyQuad,
    dstate,
    quat_inv,
    quat_mul,
    quat_rotate,
    rk4_step,
    rotmat_to_quat,
)


def test_hover_derivative_is_zero():
    """At hover thrust with identity attitude, all derivatives vanish
    (reference tests/dynamics/quadrotor_dynamics.cpp:34-48)."""
    params = QuadrotorParams()
    hover = np.full(4, params.mass * G / 4.0)
    dp, dv, dq, dw = dstate(
        np.zeros(3), np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros(3), hover, params
    )
    np.testing.assert_allclose(dp, 0, atol=1e-12)
    np.testing.assert_allclose(dv, 0, atol=1e-9)
    np.testing.assert_allclose(dq, 0, atol=1e-12)
    np.testing.assert_allclose(dw, 0, atol=1e-9)


def test_random_states_finite():
    """128 random states through dState stay finite (reference :50-60)."""
    params = QuadrotorParams()
    rng = np.random.default_rng(0)
    for _ in range(128):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        outs = dstate(
            rng.standard_normal(3) * 10,
            rng.standard_normal(3) * 5,
            q,
            rng.standard_normal(3) * 3,
            rng.random(4) * params.thrust_max,
            params,
        )
        for o in outs:
            assert np.all(np.isfinite(o))


def test_allocation_invertible_and_signs():
    params = QuadrotorParams()
    B = params.allocation
    assert abs(np.linalg.det(B)) > 1e-9
    # pure collective: equal thrusts -> zero torque
    wrench = B @ np.full(4, 1.0)
    np.testing.assert_allclose(wrench[1:], 0, atol=1e-12)
    assert wrench[0] == pytest.approx(4.0)


def test_quat_helpers():
    rng = np.random.default_rng(1)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    v = rng.standard_normal(3)
    # rotation preserves norm; inverse undoes
    r = quat_rotate(q, v)
    assert np.linalg.norm(r) == pytest.approx(np.linalg.norm(v))
    np.testing.assert_allclose(quat_rotate(quat_inv(q), r), v, atol=1e-12)
    # rotmat round trip
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    q2 = rotmat_to_quat(R)
    np.testing.assert_allclose(np.abs(q2 @ q), 1.0, atol=1e-9)


def test_rk4_energy_sane_freefall():
    """Zero thrust: RK4 reproduces ballistic motion exactly (linear ODE)."""
    params = QuadrotorParams()
    p, v = np.zeros(3), np.array([1.0, 0, 0])
    q, w = np.array([1.0, 0, 0, 0]), np.zeros(3)
    dt, T = 0.01, 100
    for _ in range(T):
        p, v, q, w = rk4_step(p, v, q, w, np.zeros(4), dt, params)
    t = dt * T
    np.testing.assert_allclose(p, [t, 0, -0.5 * G * t * t], atol=1e-9)


def test_hover_hold():
    """No command: the stack holds position (within cm) for 3 seconds."""
    quad = RigidBodyQuad(start_pos=(0, 0, 2.0))
    quad.set_velocity_command(np.zeros(3))
    for i in range(300):
        if i % 10 == 0:
            quad.set_velocity_command(np.zeros(3))  # keep the deadman fed
        s = quad.step(0.01)
    np.testing.assert_allclose(s.pos, [0, 0, 2.0], atol=0.02)
    assert np.linalg.norm(s.vel) < 0.05


def test_velocity_step_tracking():
    """4 m/s forward command: converges to the commanded speed and keeps
    altitude; the platform pitches (non-trivial attitude) while moving."""
    quad = RigidBodyQuad(start_pos=(0, 0, 2.0))
    cmd = np.array([4.0, 0.0, 0.0])
    max_tilt = 0.0
    for i in range(400):
        if i % 6 == 0:
            quad.set_velocity_command(cmd)
        s = quad.step(0.01)
        max_tilt = max(max_tilt, 2 * np.arccos(min(abs(quad.q[0]), 1.0)))
    assert s.vel[0] == pytest.approx(4.0, abs=0.3)
    assert abs(s.pos[2] - 2.0) < 0.15
    assert max_tilt > 0.05  # it actually tilted to accelerate


def test_command_timeout_decays_to_hover():
    quad = RigidBodyQuad(start_pos=(0, 0, 2.0))
    quad.set_velocity_command(np.array([3.0, 0, 0]))
    for _ in range(50):
        quad.step(0.01)
    v_mid = quad.v[0]
    assert v_mid > 0.5
    for _ in range(300):  # no further commands: timeout after 0.5 s
        quad.step(0.01)
    assert abs(quad.v[0]) < 0.25


@pytest.mark.slow
def test_rigid_trial_through_forest():
    """Full closed loop with the rigid-body stack: the expert still completes
    the course crash-free (dynamics swap does not break the protocol)."""
    from evfly_tpu.sim import generate_forest, run_trial

    rng = np.random.default_rng(4)
    field = generate_forest(rng, num_obstacles=15, trees=True)
    res = run_trial(
        field, mode="state", desired_vel=4.0, policy_every=6, max_steps=4000,
        H=40, W=52, rng=np.random.default_rng(0), log_images=False,
        dynamics="rigid",
    )
    assert res["summary"].get("time_to_finish") is not None, res["summary"]
    assert res["summary"]["number_crashes"] == 0, res["summary"]


def test_vec_rigid_matches_scalar():
    """VecRigidBodyQuads(G) advances G independent full-stack quads with
    EXACTLY the scalar RigidBodyQuad's math: drive each lane and its own
    scalar twin through the same per-lane command schedule and assert the
    trajectories match to fp round-off."""
    from evfly_tpu.sim.rigid_body import VecRigidBodyQuads

    G = 4
    rng = np.random.default_rng(11)
    starts = [(0.0, 0.0, 2.0), (1.0, -2.0, 1.5), (0.0, 3.0, 2.5), (-1.0, 0.0, 2.0)]
    scalars = [RigidBodyQuad(start_pos=s) for s in starts]
    vec = VecRigidBodyQuads(G)
    vec.pos = np.array(starts, float)
    vec._p_ref = vec.pos.copy()

    cmds = rng.uniform(-1.5, 1.5, (40, G, 3))
    cmds[..., 0] += 3.0
    for k in range(400):
        if k % 10 == 0:
            c = cmds[k // 10]
            # exercise the masked path: lane 3 only gets every other command
            mask = np.array([True, True, True, (k // 10) % 2 == 0])
            vec.set_commands(c, mask=mask)
            for g in range(G):
                if mask[g]:
                    scalars[g].set_velocity_command(c[g])
        pos, vel, t = vec.step(0.01)
        for g in range(G):
            st = scalars[g].step(0.01)
            np.testing.assert_allclose(pos[g], st.pos, rtol=0, atol=1e-9)
            np.testing.assert_allclose(vel[g], st.vel, rtol=0, atol=1e-9)
            np.testing.assert_allclose(vec.q[g], scalars[g].q, rtol=0, atol=1e-9)
    # the lanes genuinely diverged from each other (independence)
    assert np.ptp(vec.pos[:, 1]) > 0.5


def test_rotmat_to_quat_batch_all_cases():
    """The vectorized 4-case quaternion extraction matches the scalar one on
    rotations that hit every branch (incl. trace<=0 via near-pi rotations)."""
    from evfly_tpu.sim.rigid_body import rotmat_to_quat_batch

    rng = np.random.default_rng(3)
    axes = np.concatenate(
        [rng.normal(size=(32, 3)), np.eye(3), -np.eye(3)], axis=0
    )
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = np.concatenate(
        [rng.uniform(-np.pi, np.pi, 32), np.full(6, np.pi - 1e-3)]
    )
    Rs = []
    for ax, th in zip(axes, angles):
        K = np.array(
            [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
        )
        Rs.append(np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K))
    Rs = np.array(Rs)
    qb = rotmat_to_quat_batch(Rs)
    for i, R in enumerate(Rs):
        qs = rotmat_to_quat(R)
        # quaternion double-cover: compare up to sign
        if np.dot(qs, qb[i]) < 0:
            qs = -qs
        np.testing.assert_allclose(qb[i], qs, rtol=0, atol=1e-9)
