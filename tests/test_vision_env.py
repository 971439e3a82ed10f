"""VecVisionEnv: observation layout, rewards, termination, vectorization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.sim.vision_env import (
    OBS_DIM,
    EnvParams,
    VecVisionEnv,
    compute_reward,
    get_obs,
    reset,
    step,
)


@pytest.fixture
def params():
    rng = np.random.default_rng(0)
    K = 20
    return EnvParams(
        obstacle_pos=jnp.asarray(rng.uniform([5, -10, 0], [55, 10, 5], (K, 3)), jnp.float32),
        obstacle_radius=jnp.asarray(rng.uniform(0.4, 1.0, K), jnp.float32),
        goal_vel=jnp.array([4.0, 0.0, 0.0]),
        world_box=jnp.array([[-5.0, -20.0, 0.0], [65.0, 20.0, 20.0]]),
    )


def test_obs_layout(params):
    state = reset(params, jax.random.PRNGKey(0))
    obs = get_obs(params, state)
    assert obs.shape == (OBS_DIM,)  # 15 + 10*4 = 55 (vision_env.hpp:38)
    np.testing.assert_allclose(obs[:3], [4.0, 0.0, 0.0])   # goal vel
    np.testing.assert_allclose(np.asarray(obs[3:12]).reshape(3, 3), np.eye(3))
    # obstacle block sorted by distance: radii at stride-4 offset 3
    obst = np.asarray(obs[15:]).reshape(10, 4)
    d = np.linalg.norm(obst[:, :3], axis=1)
    assert (np.diff(d) >= -1e-5).all()


def test_reward_components(params):
    state = reset(params, jax.random.PRNGKey(1))
    # tracking goal velocity exactly: vel term 0, survive reward remains
    state = state._replace(vel=jnp.array([4.0, 0.0, 0.0]), pos=jnp.array([0.0, 0.0, 2.0]))
    total, comps = compute_reward(params, state)
    assert comps[0] == pytest.approx(0.0, abs=1e-6)
    assert comps[3] == pytest.approx(0.03)
    # far from obstacles at start -> no collision penalty
    assert comps[1] == pytest.approx(0.0, abs=1e-6)


def test_collision_penalty_near_obstacle(params):
    obst0 = np.asarray(params.obstacle_pos[0])
    near = jnp.asarray(obst0 + np.array([params.obstacle_radius[0] * 0.9, 0, 0]), jnp.float32)
    state = reset(params, jax.random.PRNGKey(0))._replace(pos=near)
    _total, comps = compute_reward(params, state)
    assert comps[1] < -1e-5  # collision_coeff * exp(-dist) active


def test_step_terminates_outside_box(params):
    state = reset(params, jax.random.PRNGKey(0))._replace(
        pos=jnp.array([64.95, 0.0, 2.0]), vel=jnp.array([5.0, 0.0, 0.0])
    )
    new_state, _obs, reward, done = step(params, state, jnp.array([5.0, 0.0, 0.0]))
    assert bool(done)
    assert reward == pytest.approx(-1.0)


def test_vectorized_env_steps(params):
    env = VecVisionEnv(params, num_envs=16)
    states, obs = env.reset(jax.random.PRNGKey(0))
    x0 = np.asarray(states.pos[:, 0]).copy()
    assert obs.shape == (16, OBS_DIM)
    actions = jnp.tile(jnp.array([[4.0, 0.0, 0.0]]), (16, 1))
    for _ in range(5):
        states, obs, rewards, dones = env.step(states, actions)
    assert obs.shape == (16, OBS_DIM)
    assert rewards.shape == (16,)
    dx = np.asarray(states.pos[:, 0]) - x0
    assert (dx > 0.01).all()  # every env accelerated forward
