"""Closed-loop sim tests: expert avoids obstacles; evaluator bookkeeping."""

import numpy as np
import pytest

from evfly_tpu.sim.dynamics import VelocityTrackingQuad
from evfly_tpu.sim.evaluator import TrialEvaluator
from evfly_tpu.sim.expert import expert_velocity_command
from evfly_tpu.sim.obstacles import (
    ObstacleField,
    generate_forest,
    load_obstacle_csv,
    save_obstacle_csv,
)


def test_obstacle_csv_roundtrip(tmp_path, rng):
    field = generate_forest(rng, num_obstacles=10)
    p = str(tmp_path / "static_obstacles.csv")
    save_obstacle_csv(p, field)
    back = load_obstacle_csv(p)
    np.testing.assert_allclose(back.positions, field.positions, atol=1e-6)
    np.testing.assert_allclose(back.radii, field.radii, atol=1e-6)
    assert back.is_trees == field.is_trees


def test_expert_dodges_head_on_obstacle(rng):
    # single obstacle dead ahead: expert must command a lateral component
    field = ObstacleField(np.array([[5.0, 0.0, 2.0]]), np.array([1.0]), is_trees=False)
    vel, extras = expert_velocity_command(np.array([0.0, 0.0, 2.0]), field, 4.0, rng)
    assert np.linalg.norm(vel) == pytest.approx(4.0, rel=1e-3)
    assert abs(vel[1]) + abs(vel[2]) > 0.1  # dodging
    assert extras["collisions"].sum() > 0


def test_expert_flies_straight_when_clear(rng):
    field = ObstacleField(np.zeros((0, 3)), np.zeros((0,)), is_trees=False)
    vel, _ = expert_velocity_command(np.array([0.0, 0.0, 2.0]), field, 4.0, rng)
    np.testing.assert_allclose(vel, [4.0, 0.0, 0.0], atol=1e-6)


def test_expert_altitude_recovery(rng):
    field = ObstacleField(np.zeros((0, 3)), np.zeros((0,)), is_trees=False)
    vel, _ = expert_velocity_command(np.array([0.0, 0.0, 0.5]), field, 4.0, rng)
    assert vel[2] == pytest.approx((2.0 - 0.5) * 2.0)


def test_velocity_tracking_quad_converges():
    quad = VelocityTrackingQuad()
    quad.set_velocity_command(np.array([3.0, 0.0, 0.0]))
    for _ in range(100):
        quad.set_velocity_command(np.array([3.0, 0.0, 0.0]))
        s = quad.step(0.01)
    np.testing.assert_allclose(s.vel, [3.0, 0, 0], atol=0.1)
    assert s.pos[0] > 1.0


def test_stale_command_decays():
    quad = VelocityTrackingQuad(cmd_timeout=0.1)
    quad.set_velocity_command(np.array([3.0, 0.0, 0.0]))
    for _ in range(200):
        quad.step(0.01)
    assert np.linalg.norm(quad.state.vel) < 0.5


def test_evaluator_success_and_segments():
    ev = TrialEvaluator(target=60, timeout=100)
    field = ObstacleField(np.array([[30.0, 10.0, 2.0]]), np.array([1.0]))
    t, x = 0.0, 0.0
    while ev.update(t, np.array([x, 0.0, 2.0]), field):
        t += 0.1
        x += 0.4
    s = ev.summary()
    assert s["Success"] is True
    assert s["number_crashes"] == 0
    assert "10" in s["segment_times"] and "60" in s["segment_times"]
    assert s["segment_times"]["60"] > s["segment_times"]["10"]


def test_evaluator_counts_crash_once_per_contact():
    ev = TrialEvaluator()
    field = ObstacleField(np.array([[10.0, 0.0, 2.0]]), np.array([1.0]))
    # pass straight through the obstacle: one contact episode => one crash
    t = 0.0
    for x in np.linspace(0, 61, 400):
        if not ev.update(t, np.array([x, 0.0, 2.0]), field):
            break
        t += 0.25
    s = ev.summary()
    assert s["number_crashes"] == 1
    assert s["Success"] is False


def test_evaluator_bounding_box_abort():
    ev = TrialEvaluator()
    field = ObstacleField(np.zeros((0, 3)), np.zeros((0,)))
    assert ev.update(0.0, np.array([1.0, 0.0, 2.0]), field)
    assert not ev.update(0.1, np.array([1.0, 25.0, 2.0]), field)
    assert ev.summary() == {"Success": False}


@pytest.mark.slow
def test_expert_closed_loop_reaches_goal(rng):
    """End-to-end: expert + dynamics + evaluator through a random forest."""
    from evfly_tpu.sim.closed_loop import run_trial

    field = generate_forest(rng, num_obstacles=25, trees=True)
    result = run_trial(field, mode="state", desired_vel=4.0, log_images=False, max_steps=6000)
    assert result["summary"].get("Success", False), result["summary"]
    assert result["log"].shape[1] == 21  # reference data.csv layout


@pytest.mark.slow
def test_run_evaluation_driver(tmp_path, rng):
    """launch_evaluation parity: N trials, artifacts, evaluation.yaml."""
    import os

    from evfly_tpu.sim.launch_evaluation import run_evaluation

    out = str(tmp_path / "evalout")
    summaries = run_evaluation(
        2, mode="state", out_dir=out, seed=1, num_obstacles=8,
        max_steps=1500, make_plots=False,
    )
    assert set(summaries) == {"rollout_000", "rollout_001"}
    for name in summaries:
        d = os.path.join(out, name)
        assert os.path.exists(os.path.join(d, "static_obstacles.csv"))
        assert os.path.exists(os.path.join(d, "path.csv"))
        assert os.path.exists(os.path.join(d, "dist.csv"))
        assert os.path.exists(os.path.join(d, "scalarMetrics.dat"))
    assert os.path.exists(os.path.join(out, "evaluation.yaml"))
