"""Hardware-in-the-loop harness (stream/hil.py): the native accumulator +
native flight stack + DeploymentRunner chain, driven with a scripted policy
so each safety behavior (tracking, deadman, latched box) is observable in
the resulting trajectory."""

import numpy as np
import pytest

from evfly_tpu.stream.hil import HILResult, run_hil_episode
from evfly_tpu.stream.deploy import SafetyConfig


class ScriptedPipeline:
    """Stands in for StreamingPipeline: fixed velocity policy, real frame
    plumbing (input_hw + step_frame contract)."""

    def __init__(self, vel=(1.0, 0.0, 0.0)):
        self.input_hw = (260, 346)
        self.vel = np.asarray(vel, float)
        self.frames = []

    def step_frame(self, frame):
        self.frames.append(np.asarray(frame))
        return self.vel.copy(), None


def _sensor(pos, t):
    rng = np.random.default_rng(int(t * 1000) % 2**31)
    n = 500
    return (rng.integers(0, 640, n), rng.integers(0, 480, n),
            rng.choice([-1, 1], n))


def _native_available():
    try:
        from evfly_tpu.sim.native_quad import _load

        _load()
        return True
    except RuntimeError:
        return False


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="libflightcore.so not built"
)


def test_hil_tracks_forward_command():
    pipe = ScriptedPipeline(vel=(2.0, 0.0, 0.0))
    res = run_hil_episode(pipe, _sensor, duration=6.0, des_fwd_vel=2.0)
    assert isinstance(res, HILResult)
    assert not res.guard_stopped
    # moved forward several meters, held altitude near the setpoint
    assert res.pos[-1, 0] > 5.0, res.pos[-1]
    assert abs(res.pos[-1, 2] - 2.0) < 0.3
    # frames flowed through the accumulator into the pipeline
    assert len(pipe.frames) == len(res.t)
    assert pipe.frames[0].shape == (260, 346)


def test_hil_deadman_without_trigger():
    pipe = ScriptedPipeline(vel=(3.0, 0.0, 0.0))
    res = run_hil_episode(pipe, _sensor, duration=2.0, trigger=False)
    # no /trigger -> all commands zero -> vehicle stays put
    np.testing.assert_allclose(res.cmd, 0.0)
    assert abs(res.pos[-1, 0]) < 0.1


def test_hil_safety_box_latches():
    pipe = ScriptedPipeline(vel=(4.0, 0.0, 0.0))
    safety = SafetyConfig(x_range=(-5.0, 3.0))
    res = run_hil_episode(pipe, _sensor, duration=8.0, des_fwd_vel=4.0,
                          safety=safety)
    assert res.guard_stopped
    # after the latch fires, commands are zero and the vehicle stops
    assert np.all(res.cmd[-5:] == 0.0)
    assert np.linalg.norm(res.vel[-1]) < 0.5
    # braking from 4 m/s is bounded by the geo controller's clipped
    # velocity error (v_err_max.x=0.5 -> ~2 m/s^2): a few meters of
    # physical overshoot, far short of the ~20 m an unlatched run covers
    assert res.pos[-1, 0] < 8.0


def test_hil_pilot_full_flight():
    """Pilot-flown episode (VERDICT r4 next #5): arm -> min-snap takeoff ->
    policy run as velocity references -> min-jerk landing -> off, with the
    reference pilot's mode transitions visible in the result."""
    from evfly_tpu.sim.pilot import (
        MODE_HOVER, MODE_OFF, MODE_TRAJECTORY, MODE_VELOCITY,
    )

    pipe = ScriptedPipeline(vel=(2.0, 0.0, 0.0))
    res = run_hil_episode(
        pipe, _sensor, duration=4.0, des_fwd_vel=2.0,
        start_pos=(0.0, 0.0, 0.0), use_pilot=True,
    )
    assert not res.guard_stopped
    assert res.phases.keys() == {"takeoff", "run", "land"}
    t_take, t_run, t_land = (res.phases[k] for k in ("takeoff", "run", "land"))
    assert t_take[0] < t_take[1] <= t_run[0] < t_run[1] <= t_land[1]

    modes = [m_to for _, _, m_to in res.transitions]
    # takeoff traj -> hover -> velocity -> (refused land) hover -> land traj -> off
    assert modes == [
        MODE_TRAJECTORY, MODE_HOVER, MODE_VELOCITY,
        MODE_HOVER, MODE_TRAJECTORY, MODE_OFF,
    ]

    fine_t, fine_z = res.fine[:, 0], res.fine[:, 3]
    # takeoff ended at ~takeoff_height (1.0); during the run the
    # DeploymentRunner's own altitude guard pulls toward its 2 m setpoint;
    # landing returns to ground
    z_at_hover = fine_z[np.searchsorted(fine_t, t_take[1]) - 1]
    assert z_at_hover == pytest.approx(1.0, abs=0.3)
    assert fine_z[-1] == pytest.approx(0.0, abs=0.2)
    # flew forward during the run phase
    assert res.pos[-1, 0] > 2.0
