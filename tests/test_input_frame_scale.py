"""input_frame_scale: the V(φ)-pretraining input transform
clip(scale·x, 0, 1) — the composite's depth hand-off distribution
(learner_models.py:634 clip(depth*2, 0, 1))."""

import numpy as np

import jax
import jax.numpy as jnp

from evfly_tpu.models import vitfly
from evfly_tpu.train.stepfn import make_forward_loss


def test_forward_loss_applies_scale_clip():
    model = vitfly.ConvNet()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, H, W = 4, 60, 90
    depths = rng.random((B, 1, H, W)).astype(np.float32)
    batch = {
        "input": jnp.asarray(depths),
        "desvel": jnp.full((B, 1), 4.0, jnp.float32),
        "gt_vel": jnp.asarray(rng.standard_normal((B, 3)), jnp.float32),
        "gt_frames": jnp.asarray(depths),
        "mask": jnp.ones((B,), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    fl_scaled = make_forward_loss(model, "vitfly", [1.0, 0.0], None,
                                  train=False, input_frame_scale=2.0)
    loss_scaled, _ = fl_scaled(params, batch, key)

    manual = dict(batch)
    manual["input"] = jnp.clip(batch["input"] * 2.0, 0.0, 1.0)
    fl_plain = make_forward_loss(model, "vitfly", [1.0, 0.0], None,
                                 train=False, input_frame_scale=1.0)
    loss_manual, _ = fl_plain(params, manual, key)

    np.testing.assert_allclose(float(loss_scaled), float(loss_manual), rtol=1e-6)
    # and the transform actually changes the forward (inputs saturate)
    loss_unscaled, _ = fl_plain(params, batch, key)
    assert abs(float(loss_unscaled) - float(loss_scaled)) > 1e-9
