"""Train the RL path (PPO) at reference scale on one chip and record an artifact.

The reference's RL expert trains PPO over num_envs=100 OpenMP-stepped C++
envs (/root/reference/flightmare/flightpy/configs/vision/config.yaml:
num_envs 100, num_threads 200; vec_env_base.cpp:124) via the vendored
rpg_baselines stack.  Here one jitted iteration executes rollout collection
(vmapped envs inside lax.scan), GAE, and the clipped PPO update on-device
(evfly_tpu/sim/ppo.py); this driver runs it at the same 100-env scale for
either env family and writes reward history + a greedy-policy evaluation:

  * vision    — VisionEnv (55-dim obs, velocity actions) on a generated
                forest field; eval reports mean greedy return, mean final
                x-progress, and the in-bounds fraction at episode end.
  * quadrotor — QuadrotorEnv (15-dim obs, thrust/bodyrate actions),
                hover stabilization at (0,0,5); eval reports mean greedy
                return and the mean final distance to the hover goal.

Usage (ONE JAX-on-TPU process at a time — CLAUDE.md):
  python tools/train_rl.py --env vision --iters 300 \
      --out-json artifacts/rl_vision.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_vision(args):
    import jax.numpy as jnp

    from evfly_tpu.sim.obstacles import generate_forest
    from evfly_tpu.sim.ppo import vision_env_spec
    from evfly_tpu.sim.vision_env import EnvParams

    field = generate_forest(
        np.random.default_rng(args.seed), num_obstacles=args.obstacles
    )
    params = EnvParams(
        obstacle_pos=jnp.asarray(field.positions, jnp.float32),
        obstacle_radius=jnp.asarray(field.radii, jnp.float32),
        goal_vel=jnp.array([4.0, 0.0, 0.0]),
        world_box=jnp.array([[-5.0, -20.0, 0.0], [65.0, 20.0, 20.0]]),
        max_t=args.horizon_s,
    )
    spec = vision_env_spec(params, max_speed=5.0)
    return params, spec


def build_quadrotor(args):
    from evfly_tpu.sim.quadrotor_env import default_params, ppo_spec
    from evfly_tpu.sim.vision_env import EnvParams as VisionEnvParams
    import jax.numpy as jnp

    qparams = default_params()
    spec = ppo_spec(qparams)
    # make_ppo_iteration's env_params argument is unused once a spec is
    # supplied, but the signature requires one — pass a trivial stand-in
    dummy = VisionEnvParams(
        obstacle_pos=jnp.zeros((1, 3)),
        obstacle_radius=jnp.zeros((1,)),
        goal_vel=jnp.zeros((3,)),
        world_box=jnp.array([[-1e6, -1e6, -1e6], [1e6, 1e6, 1e6]]),
    )
    return dummy, spec, qparams


def greedy_eval(spec, ac, n_envs, n_steps, seed):
    """Deterministic-policy rollout: action = act_scale * tanh(actor_mean).

    Rewards are masked after an env's first done (episodes do not reset),
    so the return is a true per-episode sum.
    """
    import jax
    import jax.numpy as jnp

    from evfly_tpu.sim.ppo import _mlp_apply

    n_layers = len([k for k in ac.actor if k.startswith("w")])

    def rollout(ac, key):
        states = jax.vmap(spec.reset)(jax.random.split(key, n_envs))
        obs = jax.vmap(spec.get_obs)(states)
        alive = jnp.ones((n_envs,), bool)

        def body(carry, _):
            states, obs, alive, ret = carry
            mean = _mlp_apply(ac.actor, obs, n_layers)
            actions = jnp.tanh(mean) * spec.act_scale
            new_states, new_obs, rewards, dones = jax.vmap(spec.step)(
                states, actions
            )
            ret = ret + jnp.where(alive, rewards, 0.0)
            # freeze finished envs (keep their terminal state for metrics)
            def pick(new, old):
                a = alive.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(a, new, old)

            states = jax.tree_util.tree_map(pick, new_states, states)
            obs = jnp.where(alive[:, None], new_obs, obs)
            alive = alive & ~dones
            return (states, obs, alive, ret), None

        ret0 = jnp.zeros((n_envs,))
        (states, obs, alive, ret), _ = jax.lax.scan(
            body, (states, obs, alive, ret0), None, length=n_steps
        )
        return states, ret, alive

    return jax.jit(rollout)(ac, jax.random.PRNGKey(seed))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", choices=["vision", "quadrotor"], default="vision")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--num-envs", type=int, default=100,
                    help="reference flightpy config: num_envs 100")
    ap.add_argument("--rollout", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--obstacles", type=int, default=40)
    ap.add_argument("--horizon-s", type=float, default=20.0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out-json", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (safe beside a chip holder; "
                    "env vars cannot override the axon preset — CLAUDE.md)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import optax

    from evfly_tpu.sim.ppo import (
        PPOConfig,
        init_actor_critic,
        make_ppo_iteration,
    )

    print(f"[RL] env={args.env} devices={jax.devices()}", flush=True)

    if args.env == "vision":
        env_params, spec = build_vision(args)
        qparams = None
    else:
        env_params, spec, qparams = build_quadrotor(args)

    cfg = PPOConfig(
        num_envs=args.num_envs,
        rollout_len=args.rollout,
        lr=args.lr,
        max_speed=spec.act_scale,
    )
    key = jax.random.PRNGKey(args.seed)
    k_init, k_env, key = jax.random.split(key, 3)
    ac = init_actor_critic(k_init, act_dim=spec.act_dim, obs_dim=spec.obs_dim)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(ac)
    env_states = jax.vmap(spec.reset)(jax.random.split(k_env, cfg.num_envs))
    iteration = make_ppo_iteration(env_params, cfg, optimizer, spec)

    history = []
    t_start = time.perf_counter()
    t0 = t_start
    for it in range(args.iters):
        key, k = jax.random.split(key)
        ac, opt_state, env_states, metrics = iteration(
            ac, opt_state, env_states, k
        )
        if it % 10 == 0 or it == args.iters - 1:
            m = {k_: float(v) for k_, v in metrics.items()}  # syncs
            m["iter"] = it
            m["wall_s"] = round(time.perf_counter() - t_start, 1)
            history.append(m)
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            sps = cfg.num_envs * cfg.rollout_len * (10 if it else 1) / dt
            print(
                f"[RL] it {it:4d} reward_mean {m['reward_mean']:+.4f} "
                f"done_frac {m['done_frac']:.3f} loss {m['loss']:.4f} "
                f"({sps:,.0f} env-steps/s)",
                flush=True,
            )

    # greedy evaluation on fresh envs.  Vision: stop 2 steps before the
    # timeout terminal so `alive` distinguishes out-of-bounds exits from
    # mere episode end (done fires on timeout at t >= max_t - dt).
    n_steps = int(args.horizon_s / 0.02) - 2 if args.env == "vision" else 500
    states, ret, alive = greedy_eval(
        spec, ac, n_envs=args.num_envs, n_steps=n_steps, seed=args.seed + 1
    )
    ret = np.asarray(jax.device_get(ret))
    alive = np.asarray(jax.device_get(alive))
    result = {
        "env": args.env,
        "num_envs": cfg.num_envs,
        "rollout_len": cfg.rollout_len,
        "iters": args.iters,
        "env_steps_total": args.iters * cfg.num_envs * cfg.rollout_len,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "reward_mean_first": history[0]["reward_mean"],
        "reward_mean_last": history[-1]["reward_mean"],
        "greedy_return_mean": float(ret.mean()),
        "greedy_return_p10": float(np.percentile(ret, 10)),
        "history": history,
    }
    pos = np.asarray(
        jax.device_get(states.pos if args.env == "vision" else states.p)
    )
    if args.env == "vision":
        result["greedy_final_x_mean"] = float(pos[:, 0].mean())
        # final x >= 60 is the reference protocol's success line
        # (evaluation_config.yaml target=60); a course-crossing policy exits
        # the world box through a face at x >= 60 (usually +x at 65), which
        # sets done/alive=False — success by protocol, regardless of which
        # face it left through after the line
        result["greedy_crossed_course_frac"] = float((pos[:, 0] >= 60.0).mean())
        # alive at scan end == still inside the box at the horizon (the
        # timeout terminal is excluded by stopping 2 steps early); with a
        # course-crossing policy this is ~0 by design
        result["greedy_inbounds_frac"] = float(alive.mean())
    else:
        goal = np.asarray(jax.device_get(qparams.goal))
        dist = np.linalg.norm(pos - goal[None], axis=1)
        result["greedy_final_goal_dist_mean"] = float(dist.mean())
        result["greedy_final_goal_dist_p90"] = float(np.percentile(dist, 90))

    line = json.dumps({k: v for k, v in result.items() if k != "history"})
    print(f"[RL] final: {line}", flush=True)
    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"[RL] wrote {args.out_json}", flush=True)


if __name__ == "__main__":
    main()
