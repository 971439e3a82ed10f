"""QuadrotorEnv (sim/quadrotor_env.py) vs the reference legacy state-RL env
(flightmare/flightlib/src/envs/quadrotor_env/quadrotor_env.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.sim.quadrotor_env import (
    QuadEnvState,
    VecQuadrotorEnv,
    _THRUST_MAX,
    _MASS,
    default_params,
    get_obs,
    reset,
    step,
)
from evfly_tpu.sim.rigid_body import QuadrotorParams, rk4_step


def _hover_state():
    return QuadEnvState(
        p=jnp.array([0.0, 0.0, 5.0]), v=jnp.zeros(3),
        q=jnp.array([1.0, 0.0, 0.0, 0.0]), w=jnp.zeros(3), t=jnp.zeros(()),
    )


def test_obs_layout_and_reset_distribution():
    params = default_params()
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    states = jax.vmap(lambda k: reset(params, k))(keys)
    obs = jax.vmap(lambda s: get_obs(params, s))(states)
    assert obs.shape == (256, 15)
    # reset ranges (quadrotor_env.cpp:95-109): xy in [-1,1], z in [4,6]>0
    assert np.abs(np.asarray(states.p[:, :2])).max() <= 1.0
    z = np.asarray(states.p[:, 2])
    assert (z > 0).all() and z.min() >= 4.0 - 1e-6 and z.max() <= 6.0 + 1e-6
    assert np.abs(np.asarray(states.v)).max() <= 1.0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(states.q), axis=1), 1.0, atol=1e-6
    )
    # R is a valid rotation (det=+1, orthonormal) laid out row-major
    R = np.asarray(obs[0, 3:12]).reshape(3, 3)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_hover_equilibrium_bodyrate_mode():
    """Mass-normalized collective g + zero rates keeps the quad at the
    goal; the total reward there is the maximum achievable (~0)."""
    params = default_params()
    s = _hover_state()
    # action normalization: c = act0*std+mean with mean=std=(4f_max/m)/2
    c_mean = (_THRUST_MAX * 4.0 / _MASS) / 2.0
    act0 = (9.8066 - c_mean) / c_mean
    act = jnp.array([act0, 0.0, 0.0, 0.0])
    for _ in range(50):
        s, obs, r5, done, fin = step(params, s, act)
    assert not bool(done)
    np.testing.assert_allclose(np.asarray(s.p), [0, 0, 5.0], atol=1e-3)
    assert float(r5[4]) == pytest.approx(0.0, abs=1e-3)
    # reward vector layout: total = sum of the four terms
    assert float(r5[4]) == pytest.approx(float(r5[:4].sum()), abs=1e-6)


def test_reward_signs_and_coefficients():
    params = default_params()
    s = QuadEnvState(
        p=jnp.array([1.0, 0.0, 3.0]), v=jnp.array([1.0, 0.0, 0.0]),
        q=jnp.array([1.0, 0.0, 0.0, 0.0]), w=jnp.array([0.5, 0.0, 0.0]),
        t=jnp.zeros(()),
    )
    _s, _obs, r5, _d, _f = step(params, s, jnp.zeros(4))
    # all shipped coefficients are negative -> every term <= 0
    assert (np.asarray(r5) <= 1e-9).all()
    # pos term dominates at the shipped coefficients (|p-goal| ~ 2.2)
    assert abs(float(r5[0])) > abs(float(r5[2]))


def test_terminals():
    params = default_params()
    # free fall from low altitude -> ground terminal with -1
    s = QuadEnvState(
        p=jnp.array([0.0, 0.0, 0.05]), v=jnp.array([0.0, 0.0, -2.0]),
        q=jnp.array([1.0, 0.0, 0.0, 0.0]), w=jnp.zeros(3), t=jnp.zeros(()),
    )
    act = jnp.array([-1.0, 0.0, 0.0, 0.0])  # zero thrust
    s, _obs, _r5, done, fin = step(params, s, act)
    assert bool(done) and float(fin) == -1.0
    # timeout -> done with 0
    s = _hover_state()._replace(t=jnp.asarray(params.max_t - params.sim_dt))
    _s, _obs, _r5, done, fin = step(params, s, jnp.zeros(4))
    assert bool(done) and float(fin) == 0.0


def test_rotor_ctrl_0_matches_numpy_rigid_body():
    """Per-rotor thrust mode: one env step == the numpy rigid-body RK4 on
    the same thrusts (the jnp dynamics is a port of rigid_body.py)."""
    params = default_params(rotor_ctrl=0)
    s = _hover_state()._replace(v=jnp.array([0.3, -0.2, 0.1]))
    thrusts = np.array([1.9, 1.8, 1.85, 1.95])
    act = jnp.asarray((thrusts - _THRUST_MAX / 2.0) / (_THRUST_MAX / 2.0))
    s2, _obs, _r, _d, _f = step(params, s, act)

    qp = QuadrotorParams()
    p, v, q, w = rk4_step(
        np.asarray(s.p, float), np.asarray(s.v, float),
        np.asarray(s.q, float), np.asarray(s.w, float),
        thrusts, params.sim_dt, qp,
    )
    np.testing.assert_allclose(np.asarray(s2.p), p, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.v), v, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.q), q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.w), w, atol=1e-4)


def test_vec_env_batched():
    env = VecQuadrotorEnv(num_envs=32)
    states, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (32, 15)
    acts = jnp.zeros((32, 4))
    states, obs, r5, done, fin = env.step(states, acts)
    assert obs.shape == (32, 15) and r5.shape == (32, 5)
    assert done.shape == (32,) and fin.shape == (32,)
    assert np.isfinite(np.asarray(obs)).all()


@pytest.mark.slow
def test_ppo_improves_quadrotor_stabilization():
    """The generalized PPO loop (sim/ppo.py EnvSpec) learns on the legacy
    state env — the flightrl stabilization task, end to end as one jitted
    program.

    The REFERENCE reset distribution (full random attitude,
    quadrotor_env.cpp:102-108) poses a tumble-recovery problem that needs
    millions of env steps; a CI-budget test instead swaps in a near-hover
    reset through the same EnvSpec seam (upright, small offsets — the
    env's step/reward/terminals stay reference-exact) where learning is
    fast and seed-robust: probed seeds 0/3/7 all improve, seed 0 cuts
    |reward| 5x and ground hits 3x in 60 iters."""
    from evfly_tpu.sim.ppo import EnvSpec, PPOConfig, train_ppo
    from evfly_tpu.sim.quadrotor_env import ppo_spec

    spec0 = ppo_spec(default_params())

    def near_hover_reset(key):
        s = spec0.reset(key)
        return s._replace(
            q=jnp.array([1.0, 0.0, 0.0, 0.0]),
            v=0.2 * s.v,
            p=jnp.array([0.3, 0.3, 1.0]) * s.p,
        )

    spec = spec0._replace(reset=near_hover_reset)
    cfg = PPOConfig(num_envs=64, rollout_len=64, lr=1e-3, epochs_per_iter=10)
    _ac, hist = train_ppo(None, cfg, n_iters=60, seed=0, spec=spec)
    r = [float(h["reward_mean"]) for h in hist]
    early, late = np.mean(r[:10]), np.mean(r[-10:])
    # measured: early=-0.0233 late=-0.0045; require >=40% improvement
    assert late > 0.6 * early, (early, late)
    # crashing less: ground-hit/done fraction drops (measured 0.0142->0.0043)
    d = [float(h["done_frac"]) for h in hist]
    assert np.mean(d[-10:]) < np.mean(d[:10]), (d[:10], d[-10:])
