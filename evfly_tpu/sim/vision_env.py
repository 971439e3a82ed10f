"""VisionEnv: gym-style RL environment, vectorized with vmap.

TPU-native rebuild of flightlib's VisionEnv + its OpenMP-vectorized wrapper
(vision_env.cpp, vec_env_base.cpp:124-156 — the reference's only data
parallelism, `num_envs: 100, num_threads: 200`).  Here the entire batch of
environments steps as ONE jitted program: dynamics, observation assembly,
and rewards are pure functions vmapped over the env axis, so "num_threads"
becomes the VPU/MXU and scaling to thousands of envs is a batch-size change.

Parity with the reference contract:

* observation = [goal_vel(3), R(9) row-major, v(3),
  10 nearest obstacles × (relative pos(3), radius)] = 55 dims
  (vision_env.cpp:153-265, kNObstacles=10, kNObstaclesState=4), obstacle
  distances clamped to max_detection_range.
* reward components (vision_env.cpp:402-442, config.yaml rewards):
  vel_coeff * ||v − goal_v||  +  Σ collision_coeff·exp(−dist) over nearby
  obstacles (margin 0.5)  +  angular_vel_coeff·||ω||  +  survive_rew,
  with defaults −0.01 / −0.01 / −0.0001 / 0.03.
* terminal on timeout or leaving the world box (±0.1 threshold), terminal
  reward −1 for the box exit (vision_env.cpp:444-471).

Divergence (documented): actions are world-frame velocity commands tracked
by the first-order model in sim/dynamics.py rather than THRUSTRATE rotor
commands — the learning-relevant interface of this stack is velocity
(SURVEY.md §2.4/§3.2); angular velocity is therefore 0 and its penalty term
inert.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

N_OBSTACLES = 10
OBS_DIM = 15 + N_OBSTACLES * 4


class EnvParams(NamedTuple):
    obstacle_pos: jnp.ndarray     # (K, 3)
    obstacle_radius: jnp.ndarray  # (K,)
    goal_vel: jnp.ndarray         # (3,)
    world_box: jnp.ndarray        # (2, 3) [min; max]
    max_detection_range: float = 10.0
    sim_dt: float = 0.02
    max_t: float = 30.0
    tau: float = 0.25
    vel_coeff: float = -0.01
    collision_coeff: float = -0.01
    angular_vel_coeff: float = -0.0001
    survive_rew: float = 0.03


class EnvState(NamedTuple):
    pos: jnp.ndarray   # (3,)
    vel: jnp.ndarray   # (3,)
    t: jnp.ndarray     # ()
    done: jnp.ndarray  # () bool


def reset(params: EnvParams, key: jax.Array) -> EnvState:
    """Randomized start near the corridor entrance (vision_env.cpp:118-147)."""
    k1, k2 = jax.random.split(key)
    pos = jnp.array([0.0, 0.0, 2.0]) + jax.random.uniform(k1, (3,), minval=-0.5, maxval=0.5) * jnp.array([1.0, 2.0, 0.5])
    vel = jax.random.uniform(k2, (3,), minval=-0.1, maxval=0.1)
    return EnvState(pos=pos, vel=vel, t=jnp.zeros(()), done=jnp.zeros((), bool))


def _obstacle_obs(params: EnvParams, pos: jnp.ndarray):
    # pad to kNObstacles with far-away zero-radius dummies so the obs block
    # is always 10×4 (vision_env.cpp pads missing obstacles the same way)
    k = params.obstacle_pos.shape[0]
    pad = max(N_OBSTACLES - k, 0)
    centers = jnp.concatenate(
        [params.obstacle_pos, jnp.full((pad, 3), 1e6, params.obstacle_pos.dtype)]
    )
    radii = jnp.concatenate([params.obstacle_radius, jnp.zeros((pad,), params.obstacle_radius.dtype)])
    rel = centers - pos[None, :]
    dist = jnp.linalg.norm(rel, axis=1)
    dist_clamped = jnp.minimum(dist, params.max_detection_range)
    order = jnp.argsort(dist)
    take = order[:N_OBSTACLES]
    rel_n = rel[take]
    rad_n = radii[take]
    obst = jnp.concatenate([rel_n, rad_n[:, None]], axis=1).reshape(-1)
    return obst, dist_clamped[take], rad_n


def get_obs(params: EnvParams, state: EnvState) -> jnp.ndarray:
    ori = jnp.eye(3).reshape(-1)  # level attitude under velocity tracking
    obst, _, _ = _obstacle_obs(params, state.pos)
    return jnp.concatenate([params.goal_vel, ori, state.vel, obst])


def compute_reward(params: EnvParams, state: EnvState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (total, components (5,)) like vision_env.cpp:402-442."""
    _, dists, radii = _obstacle_obs(params, state.pos)
    near = dists <= radii + 0.5
    collision_penalty = jnp.sum(
        jnp.where(near, params.collision_coeff * jnp.exp(-1.0 * dists), 0.0)
    )
    lin_vel_reward = params.vel_coeff * jnp.linalg.norm(state.vel - params.goal_vel)
    ang_vel_penalty = params.angular_vel_coeff * 0.0
    total = lin_vel_reward + collision_penalty + ang_vel_penalty + params.survive_rew
    comps = jnp.array([lin_vel_reward, collision_penalty, ang_vel_penalty, params.survive_rew, total])
    return total, comps


def step(params: EnvParams, state: EnvState, action: jnp.ndarray):
    """One env step with a velocity-command action -> (state, obs, reward, done)."""
    accel = (action - state.vel) / params.tau
    a_norm = jnp.linalg.norm(accel)
    accel = jnp.where(a_norm > 12.0, accel / a_norm * 12.0, accel)
    vel = state.vel + accel * params.sim_dt
    pos = state.pos + vel * params.sim_dt
    t = state.t + params.sim_dt

    timeout = t >= params.max_t - params.sim_dt
    thr = 0.1
    inside = jnp.all(pos >= params.world_box[0] + thr) & jnp.all(pos <= params.world_box[1] - thr)
    done = timeout | ~inside

    new_state = EnvState(pos=pos, vel=vel, t=t, done=done)
    reward, _ = compute_reward(params, new_state)
    reward = jnp.where(~inside, -1.0, jnp.where(timeout, 0.0, reward))
    return new_state, get_obs(params, new_state), reward, done


class VecVisionEnv:
    """Batched VisionEnv: all envs share the obstacle field; one jitted step."""

    def __init__(self, params: EnvParams, num_envs: int = 100):
        self.params = params
        self.num_envs = num_envs
        self._reset = jax.jit(jax.vmap(functools.partial(reset, params)))
        self._step = jax.jit(jax.vmap(functools.partial(step, params)))
        self._obs = jax.jit(jax.vmap(functools.partial(get_obs, params)))

    def reset(self, key: jax.Array):
        states = self._reset(jax.random.split(key, self.num_envs))
        return states, self._obs(states)

    def step(self, states, actions: jnp.ndarray):
        return self._step(states, actions)
