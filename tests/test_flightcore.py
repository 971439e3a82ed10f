"""Native flight-stack core (native/flightcore.cpp) vs the numpy twin
(sim/rigid_body.py): the two implementations share constants and operation
order, so trajectories must agree at double precision.  Mirrors the
reference's split where the flight stack is C++ (dodgelib) and the sim
drives it (SURVEY.md §2.4)."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "evfly_tpu", "native")


def _build():
    r = subprocess.run(["make", "-C", NATIVE_DIR, "libflightcore.so"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"native build unavailable: {r.stderr[-400:]}")


@pytest.fixture(scope="module")
def core():
    _build()
    from evfly_tpu.sim.native_quad import NativeFlightCore

    return NativeFlightCore


def test_native_matches_numpy_random_commands(core):
    """600 steps of random velocity commands: native == numpy to 1e-9."""
    from evfly_tpu.sim.rigid_body import RigidBodyQuad

    quad = RigidBodyQuad(start_pos=(0, 0, 2.0))
    native = core(start_pos=(0, 0, 2.0))
    rng = np.random.default_rng(3)
    dt = 0.01
    for i in range(600):
        if i % 6 == 0:
            cmd = rng.uniform(-3, 4, 3) * np.array([1, 1, 0.3])
            quad.set_velocity_command(cmd)
            native.set_velocity_command(cmd)
        s_py = quad.step(dt)
        s_cc = native.step(dt)
        # NOT bit-identical by construction: numpy solves the allocation
        # system per step (LU) while C++ uses a precomputed Gauss-Jordan
        # inverse, and the RK4 combination orders differ — so error growth
        # depends on BLAS/compiler.  Relative 1e-7 over 600 steps is tight
        # enough to catch any modeling divergence yet toolchain-robust
        # (advisor r2).
        np.testing.assert_allclose(s_cc.pos, s_py.pos, rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(s_cc.vel, s_py.vel, rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(s_cc.att, quad.q, rtol=1e-7, atol=1e-8)


def test_native_run_batch_matches_per_step(core):
    """The amortized run_batch driver equals per-step calls exactly."""
    a = core(start_pos=(0, 0, 2.0))
    b = core(start_pos=(0, 0, 2.0))
    rng = np.random.default_rng(0)
    cmds = rng.uniform(-2, 3, (5, 3))
    hist = a.run_batch(0.01, cmds, cmd_every=20, n_steps=100)
    for i in range(100):
        ci = min(i // 20, len(cmds) - 1)
        if i % 20 == 0:
            b.set_velocity_command(cmds[ci])
        s = b.step(0.01)
    np.testing.assert_allclose(hist[-1, 1:4], s.pos, atol=1e-12)
    np.testing.assert_allclose(hist[-1, 4:7], s.vel, atol=1e-12)
    assert hist.shape == (100, 14)
    assert np.all(np.isfinite(hist))


def test_native_reset(core):
    native = core(start_pos=(0, 0, 2.0))
    native.set_velocity_command([3.0, 0, 0])
    for _ in range(100):
        native.step(0.01)
    assert native.state.pos[0] > 0.5
    native.reset((1.0, -1.0, 3.0))
    s = native.state
    np.testing.assert_allclose(s.pos, [1.0, -1.0, 3.0])
    np.testing.assert_allclose(s.vel, 0.0)
    assert s.t == 0.0


def test_cpp_self_test_binary():
    """The standalone C++ property tests (hover, tracking, timeout,
    batched==per-step, no flip-over) pass."""
    _build()
    r = subprocess.run(["make", "-C", NATIVE_DIR, "test"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-400:]
    assert "all checks passed" in r.stdout
