"""PPO over VecVisionEnv — the flightpy/flightrl RL path, TPU-native.

The reference's legacy RL expert trains PPO over 100 OpenMP-stepped C++
envs (flightmare/flightpy/flightrl rpg_baselines ppo/on_policy_algorithm,
SURVEY.md §2.4).  Here the entire rollout-collect + GAE + clipped-objective
update is jitted: envs step as a vmapped batch inside lax.scan, so one
device executes rollout collection and learning with no host loop.

Standard PPO (clip 0.2, GAE λ=0.95, γ=0.99), MLP actor-critic over the
55-dim VisionEnv observation, continuous 3-D velocity actions through a
tanh squash scaled to the commanded speed range.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .vision_env import OBS_DIM, EnvParams, EnvState, get_obs, reset, step


class EnvSpec(NamedTuple):
    """Pluggable environment surface for the jitted PPO loop.

    reset(key) -> state; step(state, action) -> (state, obs, reward, done);
    get_obs(state) -> obs.  Actions arrive tanh-squashed in
    [-act_scale, act_scale]^act_dim.  The default spec is VisionEnv
    (velocity actions); quadrotor_env.ppo_spec adapts the legacy
    state-based env (normalized thrust/bodyrate actions, act_scale=1).
    """

    reset: object
    step: object
    get_obs: object
    obs_dim: int
    act_dim: int
    act_scale: float


def vision_env_spec(env_params: EnvParams, max_speed: float = 5.0) -> EnvSpec:
    return EnvSpec(
        reset=functools.partial(reset, env_params),
        step=functools.partial(step, env_params),
        get_obs=functools.partial(get_obs, env_params),
        obs_dim=OBS_DIM,
        act_dim=3,
        act_scale=max_speed,
    )


def _mlp_init(key, sizes):
    params = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        w_key, _ = jax.random.split(keys[i])
        params[f"w{i}"] = jax.random.normal(w_key, (a, b)) * jnp.sqrt(2.0 / a)
        params[f"b{i}"] = jnp.zeros((b,))
    return params


def _mlp_apply(params, x, n_layers):
    for i in range(n_layers):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            x = jnp.tanh(x)
    return x


class ActorCritic(NamedTuple):
    actor: dict
    critic: dict
    log_std: jnp.ndarray


def init_actor_critic(key, hidden=(128, 128), act_dim=3, obs_dim=OBS_DIM) -> ActorCritic:
    k1, k2 = jax.random.split(key)
    return ActorCritic(
        actor=_mlp_init(k1, (obs_dim, *hidden, act_dim)),
        critic=_mlp_init(k2, (obs_dim, *hidden, 1)),
        log_std=jnp.full((act_dim,), -0.5),
    )


def policy_sample(ac: ActorCritic, obs, key, max_speed=5.0):
    n_layers = len([k for k in ac.actor if k.startswith("w")])
    mean = _mlp_apply(ac.actor, obs, n_layers)
    std = jnp.exp(ac.log_std)
    raw = mean + std * jax.random.normal(key, mean.shape)
    action = jnp.tanh(raw) * max_speed
    logp = jnp.sum(
        -0.5 * jnp.square((raw - mean) / std) - ac.log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )
    value = _mlp_apply(ac.critic, obs, n_layers)[..., 0]
    return action, raw, logp, value


def _logp_of(ac: ActorCritic, obs, raw):
    n_layers = len([k for k in ac.actor if k.startswith("w")])
    mean = _mlp_apply(ac.actor, obs, n_layers)
    std = jnp.exp(ac.log_std)
    logp = jnp.sum(
        -0.5 * jnp.square((raw - mean) / std) - ac.log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )
    value = _mlp_apply(ac.critic, obs, n_layers)[..., 0]
    entropy = jnp.sum(ac.log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
    return logp, value, entropy


class PPOConfig(NamedTuple):
    num_envs: int = 64
    rollout_len: int = 64
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coeff: float = 0.5
    ent_coeff: float = 0.001
    lr: float = 3e-4
    epochs_per_iter: int = 4
    max_speed: float = 5.0


def make_ppo_iteration(env_params: EnvParams, cfg: PPOConfig, optimizer,
                       spec: EnvSpec = None):
    """Returns jitted iteration(ac, opt_state, env_states, key) ->
    (ac, opt_state, env_states, metrics)."""
    spec = spec or vision_env_spec(env_params, cfg.max_speed)

    def collect(ac, env_states, key):
        def rollout_step(carry, k):
            states, obs = carry
            k_act, k_reset = jax.random.split(k)
            actions, raw, logp, value = policy_sample(
                ac, obs, k_act, spec.act_scale
            )
            new_states, new_obs, rewards, dones = jax.vmap(spec.step)(
                states, actions
            )
            # auto-reset finished envs
            reset_states = jax.vmap(spec.reset)(
                jax.random.split(k_reset, cfg.num_envs)
            )
            def pick(a, b):
                d = dones.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(d, a, b)
            states_out = jax.tree_util.tree_map(pick, reset_states, new_states)
            obs_out = jax.vmap(spec.get_obs)(states_out)
            transition = (obs, raw, logp, value, rewards, dones)
            return (states_out, obs_out), transition

        obs0 = jax.vmap(spec.get_obs)(env_states)
        (env_states, last_obs), traj = jax.lax.scan(
            rollout_step, (env_states, obs0), jax.random.split(key, cfg.rollout_len)
        )
        return env_states, last_obs, traj

    def gae(values, rewards, dones, last_value):
        def scan_fn(carry, inp):
            adv_next, v_next = carry
            value, reward, done = inp
            nonterminal = 1.0 - done.astype(jnp.float32)
            delta = reward + cfg.gamma * v_next * nonterminal - value
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterminal * adv_next
            return (adv, value), adv

        (_, _), advs = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(last_value), last_value),
            (values, rewards, dones),
            reverse=True,
        )
        return advs

    def loss_fn(ac, batch):
        obs, raw, logp_old, adv, ret = batch
        logp, value, entropy = _logp_of(ac, obs, raw)
        ratio = jnp.exp(logp - logp_old)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n,
        ).mean()
        vf = jnp.square(value - ret).mean()
        return pg + cfg.vf_coeff * vf - cfg.ent_coeff * entropy, (pg, vf)

    @jax.jit
    def iteration(ac, opt_state, env_states, key):
        k_collect, k_update = jax.random.split(key)
        env_states, last_obs, (obs, raw, logp, value, rewards, dones) = collect(
            ac, env_states, k_collect
        )
        n_layers = len([k for k in ac.actor if k.startswith("w")])
        last_value = _mlp_apply(ac.critic, last_obs, n_layers)[..., 0]
        advs = gae(value, rewards, dones, last_value)
        rets = advs + value

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = (flat(obs), flat(raw), flat(logp), flat(advs), flat(rets))

        def epoch(carry, _):
            ac, opt_state = carry
            (loss, (pg, vf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ac, batch)
            updates, opt_state = optimizer.update(grads, opt_state, ac)
            ac = optax.apply_updates(ac, updates)
            return (ac, opt_state), (loss, pg, vf)

        (ac, opt_state), (losses, pgs, vfs) = jax.lax.scan(
            epoch, (ac, opt_state), None, length=cfg.epochs_per_iter
        )
        metrics = {
            "reward_mean": rewards.mean(),
            "loss": losses[-1],
            "pg_loss": pgs[-1],
            "vf_loss": vfs[-1],
            "done_frac": dones.mean(),
        }
        return ac, opt_state, env_states, metrics

    return iteration


def train_ppo(env_params: EnvParams, cfg: PPOConfig = PPOConfig(), n_iters: int = 50, seed: int = 0,
              spec: EnvSpec = None):
    """Run PPO; returns (actor_critic, list of per-iter metrics)."""
    key = jax.random.PRNGKey(seed)
    k_init, k_env, key = jax.random.split(key, 3)
    spec = spec or vision_env_spec(env_params, cfg.max_speed)
    ac = init_actor_critic(k_init, act_dim=spec.act_dim, obs_dim=spec.obs_dim)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(ac)
    env_states = jax.vmap(spec.reset)(
        jax.random.split(k_env, cfg.num_envs)
    )
    iteration = make_ppo_iteration(env_params, cfg, optimizer, spec)
    history = []
    for it in range(n_iters):
        key, k = jax.random.split(key)
        ac, opt_state, env_states, metrics = iteration(ac, opt_state, env_states, k)
        history.append({k_: float(v) for k_, v in metrics.items()})
    return ac, history
