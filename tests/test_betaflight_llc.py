"""Betaflight LLC emulation (sim/betaflight_llc.py) vs the flightlib
reference (lowlevel_controller_betaflight.cpp, pid_parts.cpp, filter.hpp)."""

import math

import numpy as np
import pytest

from evfly_tpu.sim.betaflight_llc import (
    BetaflightLLC,
    FilterBiquad,
    FilterPT1,
    PidD,
    PidI,
    PidP,
)
from evfly_tpu.sim.rigid_body import QuadrotorParams, rk4_step


def test_pt1_filter_reference_discretization():
    """flightlib's PT1 uses b0 = w/(w+1) (not the exact exp pole) —
    replicate the exact recurrence and its DC/step behavior."""
    f = FilterPT1(fc=100.0, fs=1000.0, dim=1)
    omega = 2 * math.pi * 100.0 / 1000.0
    b0 = omega / (omega + 1)
    # first step from zero state: y = b0*u
    y = f.update(np.array([1.0]))
    assert y[0] == pytest.approx(b0)
    # DC convergence to 1 (unity gain)
    for _ in range(200):
        y = f.update(np.array([1.0]))
    assert y[0] == pytest.approx(1.0, abs=1e-6)


def test_biquad_lowpass_response():
    """TI SLAA447 biquad at Q=1/sqrt(2): unity DC gain, ~-3 dB at fc,
    strong attenuation an octave above."""
    fs, fc = 1000.0, 50.0

    def gain(freq):
        f = FilterBiquad(fc=fc, fs=fs, dim=1)
        n = int(fs)
        t = np.arange(3 * n) / fs
        x = np.sin(2 * np.pi * freq * t)
        y = np.array([f.update(np.array([v]))[0] for v in x])
        return np.abs(y[n:]).max()

    assert gain(1.0) == pytest.approx(1.0, abs=0.02)
    assert gain(fc) == pytest.approx(1 / math.sqrt(2), abs=0.05)
    assert gain(4 * fc) < 0.12


def test_pid_parts_reference_constants():
    p = PidP().update(np.array([1.0, 1.0, 1.0]), np.zeros(3))
    np.testing.assert_allclose(p, [72.706, 72.892, 49.385])

    i = PidI(fs=1000.0)
    out = i.update(np.array([2.0, 0.0, 0.0]), np.zeros(3))
    np.testing.assert_allclose(out, [2.0 * 1e3 / 1000.0 * 1.0, 0, 0])
    # anti-windup at +-100 before gain
    for _ in range(100):
        out = i.update(np.array([1e6, 0.0, 0.0]), np.zeros(3))
    assert out[0] == pytest.approx(100.0 * 1.0)

    d = PidD(fs=1000.0)
    # constant gyro -> derivative settles to zero
    for _ in range(300):
        out = d.update(np.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
    # yaw D gain is zero by design
    d2 = PidD(fs=1000.0)
    out = d2.update(np.array([0.0, 0.0, 5.0]))
    assert out[2] == 0.0


def test_llc_hover_allocation():
    """Zero rates + hover collective -> four equal motor thrusts summing to
    weight (torque PID is zero at zero error/zero gyro)."""
    llc = BetaflightLLC()
    qp = llc.params
    llc.set_command(collective_thrust=9.8066, omega=np.zeros(3))
    thrusts = llc.run(np.zeros(3))
    np.testing.assert_allclose(thrusts, qp.mass * 9.8066 / 4.0, rtol=1e-9)


def test_llc_command_clamps():
    llc = BetaflightLLC()
    qp = llc.params
    llc.set_command(collective_thrust=1e9, omega=np.array([100.0, -100.0, 100.0]))
    assert llc._c_thrust == pytest.approx(4.0 * qp.thrust_max / qp.mass)
    np.testing.assert_allclose(
        llc._omega_des, [qp.omega_max[0], -qp.omega_max[1], qp.omega_max[2]]
    )
    # motor clamp: absurd rate error saturates at [0, thrust_max]
    thrusts = llc.run(np.array([-50.0, 50.0, 0.0]))
    assert thrusts.min() >= 0.0 and thrusts.max() <= qp.thrust_max + 1e-12


def test_llc_tracks_bodyrate_step_on_rigid_body():
    """Closed loop at fs=1000 on the numpy rigid body: a roll-rate step
    command is tracked within ~15% in 0.3 s without oscillation blowup —
    the identified PID stabilizes the identified plant."""
    llc = BetaflightLLC()
    qp = QuadrotorParams()
    dt = 1.0 / llc.fs
    p = np.zeros(3)
    v = np.zeros(3)
    q = np.array([1.0, 0.0, 0.0, 0.0])
    w = np.zeros(3)
    llc.set_command(collective_thrust=9.8066, omega=np.array([2.0, 0.0, 0.0]))
    hist = []
    for _ in range(300):
        thrusts = llc.run(w)
        p, v, q, w = rk4_step(p, v, q, w, thrusts, dt, qp)
        hist.append(w.copy())
    hist = np.asarray(hist)
    assert hist[-1, 0] == pytest.approx(2.0, rel=0.15)
    # no divergence on the other axes
    assert np.abs(hist[-1, 1:]).max() < 0.3
