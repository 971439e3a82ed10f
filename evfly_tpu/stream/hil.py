"""Hardware-in-the-loop deployment bench: native flight stack + runner.

The reference validates real deployment by flying the evfly_ros stack on a
vehicle (README "Real-world deployment"): a C++ accumulator node feeds
run.py's 15 Hz guarded loop, whose commands the autopilot's native control
stack executes.  This harness reproduces that architecture in-process so the
whole deployment chain is testable end to end without an aircraft:

    sensor(state) -> events -> [native evstream accumulator]
        -> DeploymentRunner.tick()   (jitted TPU model + safety guards)
        -> [native flightcore]       (SE(3) controller + rigid body, C++)
        -> new state -> sensor ...

Vehicle and accumulator are the actual native libraries that would run
host-side on an aircraft; the model step is the actual jitted pipeline.  The
``sensor`` callback closes the loop — pass a renderer-backed callable (see
tests) or replay recorded events (data/evt3.read_evt3).

Timing is simulated (the runner gets a virtual clock), so a HIL episode is
deterministic and CI-runnable; command cadence follows the reference's
15 Hz node loop against a 100 Hz vehicle step (run.py:43, sim_dt 0.01).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from ..sim.native_quad import NativeFlightCore
from .deploy import DeploymentRunner, SafetyConfig


@dataclass
class HILResult:
    t: np.ndarray          # (T,) tick times [s]
    pos: np.ndarray        # (T, 3)
    vel: np.ndarray        # (T, 3)
    cmd: np.ndarray        # (T, 3) guarded commands as issued
    guard_stopped: bool    # safety latch fired
    # full 100 Hz vehicle-rate trajectory, shape (T*steps_per_tick, 14):
    # [t, p3, v3, q_wxyz, w3] — the intra-tick dynamics the 15 Hz samples
    # above subsample (advisor r2: run_batch already computes it; safety /
    # overshoot assertions can now see between command ticks)
    fine: np.ndarray = None


def run_hil_episode(
    pipeline,
    sensor: Callable[[np.ndarray, float], tuple],
    duration: float = 5.0,
    tick_hz: float = 15.0,
    sim_dt: float = 0.01,
    des_fwd_vel: float = 4.0,
    safety: Optional[SafetyConfig] = None,
    start_pos=(0.0, 0.0, 2.0),
    trigger: bool = True,
) -> HILResult:
    """Fly one closed-loop episode on the native stack.

    ``sensor(pos, t) -> (x, y, pol)`` produces the event burst for the
    current vehicle position (arrays in sensor pixel coordinates), exactly
    what a camera driver would hand the accumulator between ticks.
    """
    clock_t = [0.0]
    runner = DeploymentRunner(
        pipeline, des_fwd_vel=des_fwd_vel, safety=safety,
        clock=lambda: clock_t[0],
    )
    quad = NativeFlightCore(start_pos=start_pos)

    steps_per_tick = max(int(round(1.0 / tick_hz / sim_dt)), 1)
    n_ticks = int(duration * tick_hz)

    ts: List[float] = []
    ps: List[np.ndarray] = []
    vs: List[np.ndarray] = []
    cs: List[np.ndarray] = []
    fine: List[np.ndarray] = []
    state = quad.state
    for _ in range(n_ticks):
        x, y, pol = sensor(state.pos, clock_t[0])
        if len(x):
            runner.push_events(x, y, pol)
        runner.push_odometry(state.pos)
        if trigger:
            runner.push_trigger()  # deadman fed every tick, like /trigger
        cmd = runner.tick()

        quad.set_velocity_command(cmd)
        hist = quad.run_batch(sim_dt, cmd[None, :], cmd_every=0, n_steps=steps_per_tick)
        fine.append(hist)
        state = quad.state
        clock_t[0] += steps_per_tick * sim_dt

        ts.append(clock_t[0])
        ps.append(state.pos.copy())
        vs.append(state.vel.copy())
        cs.append(np.asarray(cmd, float))

    return HILResult(
        t=np.asarray(ts), pos=np.asarray(ps), vel=np.asarray(vs),
        cmd=np.asarray(cs), guard_stopped=runner.safety_guard_triggered,
        fine=np.concatenate(fine, axis=0) if fine else np.zeros((0, 14)),
    )
