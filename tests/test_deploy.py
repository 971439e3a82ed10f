"""Deployment runner guard semantics (evfly_ros/run.py parity)."""

import numpy as np
import pytest

from evfly_tpu.stream.accumulator import EventAccumulator
from evfly_tpu.stream.deploy import DeploymentRunner, SafetyConfig


class FakePipeline:
    """Stands in for StreamingPipeline: returns a constant velocity."""

    input_hw = (260, 346)

    def __init__(self, vel=(4.0, 1.0, 0.5)):
        self.vel = np.array(vel)
        self.steps = 0

    def step_frame(self, frame):
        self.steps += 1
        return self.vel, None

    def reset(self):
        pass


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _runner(**kw):
    clock = FakeClock()
    r = DeploymentRunner(
        FakePipeline(), des_fwd_vel=4.0,
        safety=SafetyConfig(x_range=(-10, 10), y_range=(-10, 10), z_range=(0, 10), **kw),
        accumulator=EventAccumulator(8, 8, native=False),
        clock=clock,
    )
    return r, clock


def test_deadman_zeroes_without_trigger():
    r, clock = _runner()
    r.push_odometry([0, 0, 2])
    cmd = r.tick()
    np.testing.assert_allclose(cmd, 0.0)


def test_ramp_up_then_full_command():
    r, clock = _runner()
    r.push_odometry([0, 0, 2.0])
    clock.t = 10.0
    r.push_trigger()
    cmd0 = r.tick()  # ramp_t = 0 -> scaler 0 -> fwd limited to 1.0
    assert cmd0[0] == pytest.approx(1.0)
    assert cmd0[1] == pytest.approx(0.0)
    clock.t = 13.5  # past ramp_duration (3 s)
    r.push_trigger()
    cmd1 = r.tick()
    assert cmd1[0] == pytest.approx(4.0)
    assert cmd1[1] == pytest.approx(1.0)
    # z is a P-controller to des_z, not the model output (run.py:303)
    assert cmd1[2] == pytest.approx(1.5 * (2.0 - 2.0))


def test_safety_box_latches():
    r, clock = _runner()
    clock.t = 5.0
    r.push_trigger()
    r.push_odometry([50.0, 0, 2.0])  # outside x_range
    np.testing.assert_allclose(r.tick(), 0.0)
    assert r.safety_guard_triggered
    # back inside — still latched (run.py latched stop)
    r.push_odometry([0.0, 0, 2.0])
    r.push_trigger()
    np.testing.assert_allclose(r.tick(), 0.0)


def test_trigger_timeout_stops_commands():
    r, clock = _runner()
    r.push_odometry([0, 0, 2.0])
    clock.t = 1.0
    r.push_trigger()
    clock.t = 1.05
    assert r.tick()[0] > 0  # within deadman window
    clock.t = 1.5  # > 0.1 s since trigger
    np.testing.assert_allclose(r.tick(), 0.0)
