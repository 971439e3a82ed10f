"""PPO over the vectorized VisionEnv: learning signal on a toy corridor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.sim.ppo import PPOConfig, init_actor_critic, policy_sample, train_ppo
from evfly_tpu.sim.vision_env import EnvParams


@pytest.fixture
def empty_params():
    return EnvParams(
        obstacle_pos=jnp.asarray([[1e6, 1e6, 1e6]], jnp.float32),
        obstacle_radius=jnp.asarray([0.0], jnp.float32),
        goal_vel=jnp.array([3.0, 0.0, 0.0]),
        world_box=jnp.array([[-5.0, -20.0, 0.0], [1e6, 20.0, 20.0]]),
        max_t=5.0,
        vel_coeff=-0.05,  # stronger tracking signal for a short smoke run
    )


def test_policy_sample_shapes(empty_params):
    ac = init_actor_critic(jax.random.PRNGKey(0))
    obs = jnp.zeros((7, 55))
    action, raw, logp, value = policy_sample(ac, obs, jax.random.PRNGKey(1))
    assert action.shape == (7, 3)
    assert logp.shape == (7,)
    assert value.shape == (7,)
    assert np.abs(np.asarray(action)).max() <= 5.0  # tanh-squashed


@pytest.mark.slow
def test_ppo_improves_velocity_tracking(empty_params):
    """In an empty corridor, the reward is velocity tracking + survive —
    PPO must improve it within a few iterations."""
    cfg = PPOConfig(num_envs=32, rollout_len=32, epochs_per_iter=4, lr=1e-3)
    _ac, history = train_ppo(empty_params, cfg, n_iters=40, seed=0)
    early = np.mean([h["reward_mean"] for h in history[:5]])
    late = np.mean([h["reward_mean"] for h in history[-5:]])
    # measured curve: ~-0.25 over the first iters -> ~-0.15 by iter 40
    assert late > early + 0.02, (early, late)
