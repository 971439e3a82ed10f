"""Path-planning expert (sim/planner.py) vs reference semantics
(envtest/ros/path_planning.py:10-256)."""

import numpy as np

from evfly_tpu.sim.obstacles import ObstacleField
from evfly_tpu.sim.planner import Planner, PlannerExpert


def test_fill_map_box_stamp():
    p = Planner()
    p.fill_map([(10.0, 0.0, 3.0, (2.0, 2.0, 2.0))])
    # inflated half-extent 2.3 at 1 m grid: cells 8..12 in x, -2..2 in y, 1..5 in z
    assert p.query_map([10, 0, 3]) == 1
    assert p.query_map([12, 0, 3]) == 1
    assert p.query_map([13, 0, 3]) == 0
    assert p.query_map([10, 2, 3]) == 1
    assert p.query_map([10, 3, 3]) == 0
    assert p.query_map([10, 0, 5]) == 1
    assert p.query_map([10, 0, 6]) == 0


def test_idx_map_matches_argmin():
    p = Planner()
    xs, ys, zs = p.grid_axes()
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    grid = np.stack([gx, gy, gz], axis=-1)
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.uniform([0, -20, 0], [60, 20, 20])
        ref = np.unravel_index(
            np.argmin(np.linalg.norm(grid - q[None, None, None], axis=-1)), p.map.shape
        )
        got = p.idx_map(q)
        # ties (exact .5 offsets) are measure-zero for uniform draws
        assert tuple(ref) == got


def test_find_path_sidesteps_obstacle():
    p = Planner()
    p.fill_map([(10.0, 0.0, 2.0, (2.0, 2.0, 2.0))])
    path = p.find_path(np.array([0, 0, 2.0]), np.array([60, 0, 2.0]))
    assert path != -1
    path = np.asarray(path)
    assert path[-1][0] >= 60.0
    # the walk must leave y=0 around x in [8, 12]
    near = path[(path[:, 0] >= 7) & (path[:, 0] <= 13)]
    assert np.any(np.abs(near[:, 1]) >= 2.0)
    # and every path point is collision-free
    for pt in path:
        assert p.query_map(pt) == 0


def test_spline_boundary_conditions():
    p = Planner()
    p.fill_map([(10.0, 0.0, 2.0, (2.0, 2.0, 2.0))])
    vel = 4.0
    splines, ts = p.calculate_path_and_spline([0, 0, 2.0], [60, 0, 2.0], velocity=vel)
    # reference bc_type: x'(0)=0, x'(T)=velocity; y/z clamped to 0 both ends
    assert abs(splines[0](ts[0], 1) - 0.0) < 1e-8
    assert abs(splines[0](ts[-1], 1) - vel) < 1e-8
    assert abs(splines[1](ts[0], 1)) < 1e-8
    assert abs(splines[1](ts[-1], 1)) < 1e-8


def test_planner_expert_flies_through_forest():
    """Follow the spline with the first-order quad: must reach x=60 with the
    planned path staying collision-free wrt inflated obstacles."""
    from evfly_tpu.sim.dynamics import VelocityTrackingQuad
    from evfly_tpu.sim.evaluator import TrialEvaluator

    rng = np.random.default_rng(3)
    # forest-like trees in the corridor
    xs = rng.uniform(8, 52, size=10)
    ys = rng.uniform(-6, 6, size=10)
    field = ObstacleField(
        positions=np.stack([xs, ys, np.full(10, 3.0)], axis=1),
        radii=np.full(10, 0.8),
        is_trees=True,
    )
    expert = PlannerExpert(field, desired_vel=4.0)
    quad = VelocityTrackingQuad()
    ev = TrialEvaluator()
    for i in range(9000):
        s = quad.step(0.01)
        if not ev.update(s.t, s.pos, field):
            break
        if i % 6 == 0:
            quad.set_velocity_command(expert.velocity_at(s.t, s.pos))
    summary = ev.summary()
    assert summary.get("time_to_finish") is not None, summary
    assert summary["number_crashes"] == 0, summary


def _cul_de_sac_walls():
    """A U-shaped pocket opening toward -x at y=0: the greedy walk enters
    along y=0, hits the back wall, and its ±y sidestep scan is capped by
    the side walls — unrecoverable without real search."""
    walls = []
    # back wall at x=20 spanning y in [-6, 6]
    walls.append((20.0, 0.0, 2.0, (1.0, 6.0, 20.0)))
    # side walls at y=+-6 running x in [12, 20]
    walls.append((16.0, 6.0, 2.0, (4.0, 1.0, 20.0)))
    walls.append((16.0, -6.0, 2.0, (4.0, 1.0, 20.0)))
    return walls


def _densely_free(planner, path, samples=20):
    """The flown trajectory follows the knot chain, so collision-freedom
    must hold along SEGMENTS, not just at knots."""
    path = np.asarray(path, float)
    for a, b in zip(path, path[1:]):
        for t in np.linspace(0.0, 1.0, samples):
            if planner.query_map(a + t * (b - a)) == 1:
                return False
    return True


def test_bfs_escapes_cul_de_sac_greedy_cannot():
    """VERDICT r4 next #7 acceptance: a layout where the greedy +x walk
    fails but BFS routes around the pocket.

    The greedy walk's ±y sidestep scan skips over occupied cells
    (reference path_planning.py:171-177 — the while loop continues until
    a FREE cell, however far), so inside the pocket it teleports across
    the side wall: the knot path looks free but its segment cuts straight
    through the wall, crashing the flown spline."""
    start, end = np.array([0, 0, 2.0]), np.array([60, 0, 2.0])

    pg = Planner()
    pg.fill_map(_cul_de_sac_walls())
    greedy = pg.find_path(start, end)
    greedy_ok = greedy != -1 and _densely_free(pg, greedy)
    assert not greedy_ok

    pb = Planner()
    pb.fill_map(_cul_de_sac_walls())
    path = pb.find_path_bfs(start, end)
    assert path != -1
    path = np.asarray(path)
    assert path[-1][0] >= 60.0
    assert _densely_free(pb, path)
    # adjacent knots stay 6-connected segments (axis-aligned moves only),
    # so linear interpolation between knots cannot cut a corner diagonally
    for a, b in zip(path, path[1:]):
        assert np.count_nonzero(np.abs(b - a) > 1e-9) == 1


def test_bfs_matches_contract_on_open_field():
    """On a field the greedy walk handles, BFS also succeeds and both obey
    the same success contract (reach x >= end_x, collision-free)."""
    p = Planner()
    p.fill_map([(10.0, 0.0, 2.0, (2.0, 2.0, 2.0))])
    path = p.find_path_bfs(np.array([0, 0, 2.0]), np.array([60, 0, 2.0]))
    assert path != -1
    path = np.asarray(path)
    assert path[-1][0] >= 60.0
    for pt in path:
        assert p.query_map(pt) == 0
    # start in collision -> -1, like find_path
    assert p.find_path_bfs(np.array([10, 0, 2.0]), np.array([60, 0, 2.0])) == -1


def test_bfs_feeds_spline():
    p = Planner()
    p.fill_map(_cul_de_sac_walls())
    path = p.find_path_bfs(np.array([0, 0, 2.0]), np.array([60, 0, 2.0]))
    splines, ts = p.fit_spline(path, velocity=4.0)
    assert abs(splines[0](ts[0], 1) - 0.0) < 1e-8
    assert abs(splines[0](ts[-1], 1) - 4.0) < 1e-8
