"""Lockstep batched rollouts (sim/batched.py) vs the sequential references.

1. state mode: a batched trial must reproduce run_trial exactly — the expert
   depends only on position + its per-trial rng, so trajectories, logs, and
   summaries must match.
2. BatchedStreamingPipeline must equal per-stream StreamingPipeline outputs
   (same recurrent carries) on a toy model with LSTM-like state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.sim import generate_forest, run_trial
from evfly_tpu.sim.batched import BatchedQuads, run_trials_batched
from evfly_tpu.sim.dynamics import VelocityTrackingQuad
from evfly_tpu.stream.pipeline import BatchedStreamingPipeline, StreamingPipeline


def test_batched_quads_match_scalar():
    rng = np.random.default_rng(0)
    bq = BatchedQuads(3)
    qs = [VelocityTrackingQuad() for _ in range(3)]
    for step in range(50):
        if step % 7 == 0:
            cmds = rng.normal(size=(3, 3)) * 3
            bq.set_commands(cmds)
            for q, c in zip(qs, cmds):
                q.set_velocity_command(c)
        pos, vel, t = bq.step(0.01)
        for g, q in enumerate(qs):
            s = q.step(0.01)
            np.testing.assert_allclose(pos[g], s.pos, atol=1e-12)
            np.testing.assert_allclose(vel[g], s.vel, atol=1e-12)


@pytest.mark.slow
def test_batched_state_mode_matches_run_trial():
    rng = np.random.default_rng(5)
    fields = [generate_forest(rng, num_obstacles=12, trees=True) for _ in range(2)]
    H, W = 40, 52
    seed = 11

    batched = run_trials_batched(
        fields, mode="state", desired_vels=4.0, policy_every=6,
        max_steps=900, H=H, W=W, seed=seed, log_images=False,
    )
    for g, field in enumerate(fields):
        single = run_trial(
            field, mode="state", desired_vel=4.0, policy_every=6,
            max_steps=900, H=H, W=W,
            rng=np.random.default_rng(seed + 977 * g), log_images=False,
        )
        assert batched[g]["summary"] == single["summary"]
        bl, sl = batched[g]["log"], single["log"]
        assert bl.shape == sl.shape
        # timestamps, desvel, pos, vel, velcmd, collide flag
        np.testing.assert_allclose(bl[:, 1:3], sl[:, 1:3], atol=1e-6)
        np.testing.assert_allclose(bl[:, 7:16], sl[:, 7:16], atol=1e-5)
        np.testing.assert_allclose(bl[:, 20], sl[:, 20], atol=0)


class _ToyRecurrentModel:
    """Composite-shaped toy: vel = tanh(Wx + h), h' = h + mean(x); depth = x."""

    def init_hidden(self, dtype=jnp.float32):
        return ((jnp.zeros((1, 4), dtype), None), jnp.zeros((1, 4), dtype))

    def init(self, key):
        return {"w": jax.random.normal(key, (4,))}

    def apply(self, params, X, train=False, rng=None, frame_mask=None):
        x, desvel, h_unet, h_vit = X[0], X[1], X[2], X[3]
        if h_vit is None:
            h_vit = jnp.zeros((1, 4), jnp.float32)
        feat = jnp.stack(
            [x.mean(), x.std(), x.max(), desvel[0, 0]]
        )[None]
        vel3 = jnp.tanh(params["w"][:3] * feat[0, :3] + h_vit[0, :3])[None]
        new_h = h_vit + feat
        depth = x
        return vel3, (depth, None, ((h_unet[0] if h_unet else None, None), new_h)), {}


def test_batched_pipeline_matches_sequential():
    model = _ToyRecurrentModel()
    params = model.init(jax.random.PRNGKey(0))
    G, H, W = 3, 8, 10
    desvels = np.array([3.0, 4.0, 5.0], np.float32)

    frames = np.random.default_rng(2).normal(size=(5, G, H, W)).astype(np.float32)

    batched = BatchedStreamingPipeline(
        model, params, num_streams=G, desvel=desvels, input_hw=(H, W)
    )
    singles = [
        StreamingPipeline(model, params, desvel=float(desvels[g]), input_hw=(H, W))
        for g in range(G)
    ]

    for t in range(5):
        reset = np.array([t == 2, False, t == 4])
        bv, _bd = batched.step_frames(jnp.asarray(frames[t]), reset_mask=reset)
        for g in range(G):
            if reset[g]:
                singles[g].reset()
            sv, _sd = singles[g].step_frame(jnp.asarray(frames[t, g]))
            np.testing.assert_allclose(np.asarray(bv[g]), np.asarray(sv), atol=1e-5)


def test_batched_rigid_expert_trial():
    """Batched rollouts under the FULL flight stack (dynamics='rigid'):
    the expert completes a small course crash-free, as in the single-trial
    rigid test (test_rigid_body.test_rigid_trial_through_forest)."""
    import numpy as np

    from evfly_tpu.sim import generate_forest
    from evfly_tpu.sim.batched import run_trials_batched

    rng = np.random.default_rng(4)
    fields = [generate_forest(rng, num_obstacles=15, trees=True) for _ in range(2)]
    results = run_trials_batched(
        fields, mode="state", desired_vels=4.0, policy_every=6,
        command_every=3, max_steps=4000, H=40, W=52, seed=0,
        log_images=False, dynamics="rigid",
    )
    for r in results:
        assert r["summary"].get("time_to_finish") is not None, r["summary"]
        assert r["summary"]["number_crashes"] == 0, r["summary"]
