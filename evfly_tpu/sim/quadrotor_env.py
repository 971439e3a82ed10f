"""QuadrotorEnv: state-based RL environment (legacy agile_flight path).

Behavioral rebuild of
/root/reference/flightmare/flightlib/src/envs/quadrotor_env/quadrotor_env.cpp
(obs/reset :89-154, step/reward :155-199, terminals :201-213) — the
stabilization env flightrl's PPO trained before the vision task existed.
Semantics preserved:

- observation (15): position(3), rotation matrix row-major(9), velocity(3)
  (quadrotor_env.cpp:132-153; the 18-dim w-variant stays commented out in
  the reference too).
- reset: p_xy ~ U(-1,1), p_z ~ U(-1,1)+5 mirrored positive, v ~ U(-1,1)^3,
  attitude = normalized U(-1,1)^4 quaternion, motors at rest (:89-128).
- actions, rotor_ctrl=1 (bodyrate mode): normalized [-1,1]^4 ->
  collective mass-normalized thrust + bodyrates via act*std+mean with
  mean=[(f_max/m)/2,0,0,0], std=[(f_max/m)/2, omega_max] (:78-86); the
  simple LLC (bodyrate P -> torque -> allocation, clamped) tracks them, as
  in flightlib's Quadrotor::runSimpleFlight.
- actions, rotor_ctrl=0: per-rotor thrusts, mean=std=single_thrust_max/2
  (:73-76).
- reward vector (5): [pos, ori, lin_vel, ang_vel, total] with the shipped
  coefficients (flightpy/configs/control/config.yaml: pos -0.002,
  ori -0.002, lin_vel -0.0001, ang_vel -0.0001), goal (0,0,5) (:180-197).
  ori uses the rotation's total angle from identity — the smooth-everywhere
  equivalent of the reference's eulerAngles(2,1,0).norm() magnitude (the
  Euler norm is convention- and branch-dependent; both are zero exactly at
  identity and grow with tilt).
- terminals: z <= 0.02 -> terminal reward -1; episode time over max_t ->
  0 (:201-213).

TPU-native design: pure-function reset/step over a NamedTuple state with a
jnp RK4 rigid body (the same agilicious constants as sim/rigid_body.py);
``VecQuadrotorEnv`` vmaps + jits the whole batch like VecVisionEnv — one
XLA program replaces flightlib's OpenMP vec env (vec_env_base.cpp:124).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .rigid_body import QuadrotorParams

G = 9.8066


class QuadEnvParams(NamedTuple):
    goal: jnp.ndarray            # (3,) == (0, 0, 5)
    pos_coeff: float = -0.002
    ori_coeff: float = -0.002
    lin_vel_coeff: float = -0.0001
    ang_vel_coeff: float = -0.0001
    sim_dt: float = 0.02
    max_t: float = 5.0
    rotor_ctrl: int = 1          # 1 = collective thrust + bodyrates
    kp_rate: float = 20.0


def default_params(**over) -> QuadEnvParams:
    return QuadEnvParams(goal=jnp.array([0.0, 0.0, 5.0], jnp.float32))._replace(**over)


class QuadEnvState(NamedTuple):
    p: jnp.ndarray     # (3,)
    v: jnp.ndarray     # (3,)
    q: jnp.ndarray     # (4,) wxyz
    w: jnp.ndarray     # (3,) body rates
    t: jnp.ndarray     # ()


# static agilicious constants as jnp (rigid_body.QuadrotorParams)
_QP = QuadrotorParams()
_J = jnp.asarray(_QP.J, jnp.float32)
_J_INV = jnp.asarray(__import__("numpy").linalg.inv(_QP.J), jnp.float32)
_ALLOC = jnp.asarray(_QP.allocation, jnp.float32)
_ALLOC_INV = jnp.asarray(__import__("numpy").linalg.inv(_QP.allocation), jnp.float32)
_THRUST_MAX = float(_QP.thrust_max)
_MASS = float(_QP.mass)
_OMEGA_MAX = jnp.asarray(_QP.omega_max, jnp.float32)
_GVEC = jnp.array([0.0, 0.0, -G], jnp.float32)


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _quat_rotate(q, v):
    u = q[1:]
    return v + 2.0 * jnp.cross(u, jnp.cross(u, v) + q[0] * v)


def _rotmat(q):
    w, x, y, z = q
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _dstate(p, v, q, w, thrusts):
    wrench = _ALLOC @ thrusts
    dv = _quat_rotate(q, jnp.array([0.0, 0.0, wrench[0] / _MASS])) + _GVEC
    dq = 0.5 * _quat_mul(q, jnp.concatenate([jnp.zeros(1), w]))
    dw = _J_INV @ (wrench[1:] - jnp.cross(w, _J @ w))
    return v, dv, dq, dw


def _rk4(p, v, q, w, thrusts, dt):
    s0 = (p, v, q, w)
    k1 = _dstate(*s0, thrusts)
    k2 = _dstate(*(a + 0.5 * dt * b for a, b in zip(s0, k1)), thrusts)
    k3 = _dstate(*(a + 0.5 * dt * b for a, b in zip(s0, k2)), thrusts)
    k4 = _dstate(*(a + dt * b for a, b in zip(s0, k3)), thrusts)
    p, v, q, w = (
        a + dt / 6.0 * (b1 + 2 * b2 + 2 * b3 + b4)
        for a, b1, b2, b3, b4 in zip(s0, k1, k2, k3, k4)
    )
    return p, v, q / jnp.linalg.norm(q), w


def reset(params: QuadEnvParams, key: jax.Array) -> QuadEnvState:
    """quadrotor_env.cpp:89-128 distributions."""
    kp, kv, kq = jax.random.split(key, 3)
    pxy_z = jax.random.uniform(kp, (3,), minval=-1.0, maxval=1.0)
    pz = jnp.abs(pxy_z[2] + 5.0)  # z = U(-1,1)+5, mirrored positive
    p = jnp.array([pxy_z[0], pxy_z[1], pz])
    v = jax.random.uniform(kv, (3,), minval=-1.0, maxval=1.0)
    q = jax.random.uniform(kq, (4,), minval=-1.0, maxval=1.0)
    q = q / jnp.linalg.norm(q)
    return QuadEnvState(p=p, v=v, q=q, w=jnp.zeros(3), t=jnp.zeros(()))


def get_obs(params: QuadEnvParams, state: QuadEnvState) -> jnp.ndarray:
    """15-dim: p, R (row-major), v (quadrotor_env.cpp:132-153)."""
    return jnp.concatenate([state.p, _rotmat(state.q).reshape(-1), state.v])


def _denormalize_action(params: QuadEnvParams, act: jnp.ndarray):
    if params.rotor_ctrl == 0:
        mean = std = _THRUST_MAX / 2.0
        return act * std + mean  # per-rotor thrusts
    c_mean = (_THRUST_MAX * 4.0 / _MASS) / 2.0
    mean = jnp.array([c_mean, 0.0, 0.0, 0.0])
    std = jnp.concatenate([jnp.array([c_mean]), _OMEGA_MAX])
    return act * std + mean  # [mass-norm collective, bodyrates]


def step(params: QuadEnvParams, state: QuadEnvState, action: jnp.ndarray):
    """One sim_dt step.  Returns (new_state, obs, reward5, done, final_rew).

    reward5 = [pos, ori, lin_vel, ang_vel, total] (quadrotor_env.cpp:178-197);
    final_rew is the terminal bonus (-1 ground hit / 0 timeout) the vec
    wrapper adds, matching isTerminalState (:201-213)."""
    pi_act = _denormalize_action(params, action)
    if params.rotor_ctrl == 0:
        thrusts = jnp.clip(pi_act, 0.0, _THRUST_MAX)
    else:
        # simple LLC: bodyrate P -> torque; allocation -> clamped thrusts
        c_thrust = pi_act[0] * _MASS
        tau = _J @ (params.kp_rate * (pi_act[1:] - state.w)) + jnp.cross(
            state.w, _J @ state.w
        )
        thrusts = _ALLOC_INV @ jnp.concatenate([jnp.array([c_thrust]), tau])
        thrusts = jnp.clip(thrusts, 0.0, _THRUST_MAX)

    p, v, q, w = _rk4(state.p, state.v, state.q, state.w, thrusts, params.sim_dt)
    new_state = QuadEnvState(p=p, v=v, q=q, w=w, t=state.t + params.sim_dt)

    pos_r = params.pos_coeff * jnp.linalg.norm(p - params.goal)
    # rotation angle from identity: |angle| = 2*acos(|q_w|) — smooth, zero
    # exactly when the reference's eulerAngles(2,1,0).norm() is zero
    ang = 2.0 * jnp.arccos(jnp.clip(jnp.abs(q[0]), 0.0, 1.0))
    ori_r = params.ori_coeff * ang
    lin_r = params.lin_vel_coeff * jnp.linalg.norm(v)
    ang_r = params.ang_vel_coeff * jnp.linalg.norm(w)
    total = pos_r + ori_r + lin_r + ang_r
    reward5 = jnp.stack([pos_r, ori_r, lin_r, ang_r, total])

    hit_ground = p[2] <= 0.02
    timeout = new_state.t >= params.max_t - params.sim_dt
    done = hit_ground | timeout
    final_rew = jnp.where(hit_ground, -1.0, 0.0)
    return new_state, get_obs(params, new_state), reward5, done, final_rew


def ppo_spec(params: QuadEnvParams = None):
    """EnvSpec adapter for sim.ppo.train_ppo: normalized [-1,1]^4 actions
    (act_scale=1 -> the tanh squash IS the reference's normalization),
    scalar reward = total shaped reward + terminal bonus, like the
    flightrl vec wrapper's summed reward channel."""
    from .ppo import EnvSpec

    params = params or default_params()

    def step_scalar(state, action):
        new_state, obs, r5, done, fin = step(params, state, action)
        return new_state, obs, r5[4] + fin, done

    return EnvSpec(
        reset=functools.partial(reset, params),
        step=step_scalar,
        get_obs=functools.partial(get_obs, params),
        obs_dim=15,
        act_dim=4,
        act_scale=1.0,
    )


class VecQuadrotorEnv:
    """Batched QuadrotorEnv: one jitted vmapped step for all envs — the
    TPU replacement for the OpenMP vec env (vec_env_base.cpp:124)."""

    def __init__(self, params: QuadEnvParams = None, num_envs: int = 100):
        self.params = params or default_params()
        self.num_envs = num_envs
        self._reset = jax.jit(jax.vmap(functools.partial(reset, self.params)))
        self._step = jax.jit(jax.vmap(functools.partial(step, self.params)))
        self._obs = jax.jit(jax.vmap(functools.partial(get_obs, self.params)))

    def reset(self, key: jax.Array):
        states = self._reset(jax.random.split(key, self.num_envs))
        return states, self._obs(states)

    def step(self, states, actions: jnp.ndarray):
        return self._step(states, actions)
