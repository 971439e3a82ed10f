"""Pilot state machine (sim/pilot.py) vs the dodgelib Pilot semantics
(dodgelib/src/pilot/pilot.cpp:104-203, simple_sim_pilot.yaml params)."""

import numpy as np
import pytest

from evfly_tpu.sim.pilot import (
    MODE_FEEDTHROUGH,
    MODE_HOVER,
    MODE_OFF,
    MODE_TRAJECTORY,
    MODE_VELOCITY,
    Pilot,
    PilotParams,
)
from evfly_tpu.sim.rigid_body import RigidBodyQuad


def _fly(pilot, quad, seconds, dt=0.01):
    for _ in range(int(seconds / dt)):
        pilot.update()
        quad.step(dt)


@pytest.fixture
def grounded():
    quad = RigidBodyQuad(start_pos=(0.0, 0.0, 0.0))
    return Pilot(quad=quad), quad


def test_full_episode_arm_takeoff_fly_land(grounded):
    """arm -> takeoff -> hover -> velocity -> force hover -> land -> off,
    with the mode transitions the reference pilot walks through."""
    pilot, quad = grounded
    assert pilot.mode == MODE_OFF
    # velocity reference rejected before takeoff (pilot.cpp:73-77)
    assert not pilot.set_velocity_reference([1.0, 0, 0])

    assert pilot.start()
    assert pilot.mode == MODE_TRAJECTORY
    # takeoff: 1.0 m at 0.6 m/s -> ~1.67 s; give it 3 s + settle
    _fly(pilot, quad, 3.5)
    assert pilot.mode == MODE_HOVER
    assert quad.state.pos[2] == pytest.approx(1.0, abs=0.15)

    # landing is refused outside hover only AFTER a velocity switch below;
    # from hover the velocity reference is accepted
    assert pilot.set_velocity_reference([1.0, 0.0, 0.0])
    assert pilot.mode == MODE_VELOCITY
    _fly(pilot, quad, 2.0)
    assert quad.state.pos[0] > 1.0  # actually moved forward
    assert quad.state.pos[2] == pytest.approx(1.0, abs=0.3)

    # land() from velocity mode: refused, force-hovers instead
    # ("Cannot land (yet) when not in hover!", pilot.cpp:144-148)
    assert not pilot.land()
    assert pilot.mode == MODE_HOVER
    _fly(pilot, quad, 1.0)

    z_hover = quad.state.pos[2]
    assert pilot.land()
    assert pilot.mode == MODE_TRAJECTORY
    _fly(pilot, quad, z_hover / 0.6 + 2.0)
    assert pilot.mode == MODE_OFF
    assert quad.state.pos[2] == pytest.approx(0.0, abs=0.2)

    modes = [m_to for _, _, m_to in pilot.transitions]
    assert modes == [
        MODE_TRAJECTORY, MODE_HOVER,          # takeoff
        MODE_VELOCITY,                        # velocity reference
        MODE_HOVER,                           # refused land -> force hover
        MODE_TRAJECTORY, MODE_OFF,            # landing
    ]
    # transition times are monotonic
    ts = [t for t, _, _ in pilot.transitions]
    assert all(a <= b for a, b in zip(ts, ts[1:]))


def test_handheld_start_skips_takeoff():
    """z above takeoff_threshold at start(): assume handheld, straight to
    hover (pilot.cpp:118-122)."""
    quad = RigidBodyQuad(start_pos=(0.0, 0.0, 2.0))
    pilot = Pilot(quad=quad)
    assert pilot.start()
    assert pilot.mode == MODE_HOVER
    _fly(pilot, quad, 1.0)
    assert quad.state.pos[2] == pytest.approx(2.0, abs=0.1)


def test_takeoff_tracks_min_snap_profile(grounded):
    """The climb stays close to the rest-to-rest min-snap reference and
    ends at takeoff_height with near-zero velocity."""
    pilot, quad = grounded
    pilot.start()
    seg = pilot._segment
    max_err = 0.0
    dt = 0.01
    for _ in range(int(seg.duration / dt)):
        pilot.update()
        quad.step(dt)
        if pilot.mode == MODE_TRAJECTORY:
            p_ref, _v, _done = seg.sample(quad.state.t)
            max_err = max(max_err, abs(quad.state.pos[2] - p_ref[2]))
    assert max_err < 0.25
    _fly(pilot, quad, 1.0)
    assert np.linalg.norm(quad.state.vel) < 0.1


def test_feedthrough_timeout_brakes_to_hover(grounded):
    """Unfed feedthrough + stop_after_feedthrough -> force hover after
    feedthrough_timeout (0.1 s)."""
    pilot, quad = grounded
    pilot.start()
    _fly(pilot, quad, 3.5)
    assert pilot.set_feedthrough_command([1.0, 0.0, 0.0])
    assert pilot.mode == MODE_FEEDTHROUGH
    # feed it for 1 s (velocity tracking ramps from rest)
    for _ in range(100):
        pilot.set_feedthrough_command([1.0, 0.0, 0.0])
        pilot.update()
        quad.step(0.01)
    x_ft = quad.state.pos[0]
    assert x_ft > 0.3
    # stop feeding: watchdog fires within the timeout and the quad brakes
    # back to the hover anchor (transient overshoot while shedding ~1 m/s
    # is physical — what matters is it returns and holds)
    _fly(pilot, quad, 3.0)
    assert pilot.mode == MODE_HOVER
    assert abs(quad.state.pos[0] - pilot._hover_pos[0]) < 0.3
    assert np.linalg.norm(quad.state.vel) < 0.2


def test_feedthrough_rejected_when_off(grounded):
    pilot, _quad = grounded
    assert not pilot.set_feedthrough_command([1.0, 0.0, 0.0])
    assert pilot.mode == MODE_OFF


def test_pilot_drives_native_flightcore():
    """Same state machine over the C++ flight core (the HIL vehicle)."""
    pytest.importorskip("ctypes")
    from evfly_tpu.sim.native_quad import NativeFlightCore

    try:
        quad = NativeFlightCore(start_pos=(0.0, 0.0, 0.0))
    except OSError:
        pytest.skip("native flightcore library not built")
    pilot = Pilot(quad=quad)
    pilot.start()
    for _ in range(350):
        pilot.update()
        quad.step(0.01)
    assert pilot.mode == MODE_HOVER
    assert quad.state.pos[2] == pytest.approx(1.0, abs=0.15)
    pilot.land()
    for _ in range(400):
        pilot.update()
        quad.step(0.01)
    assert pilot.mode == MODE_OFF
    assert quad.state.pos[2] == pytest.approx(0.0, abs=0.2)
