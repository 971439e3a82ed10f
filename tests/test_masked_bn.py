"""Padded-chunk training must equal the reference's ragged (unpadded) chunk.

The reference trains on ragged trajectory-tail chunks directly
(learner.py:961-1034); our XLA-friendly fixed-size chunks pad with zero
frames + a validity mask.  These tests pin the invariant that padding is
inert: BatchNorm batch statistics, running-stat updates, and the loss all
match the unpadded computation exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_batch_norm2d_masked_stats_equal_unpadded(rng):
    from evfly_tpu.ops.imageops import batch_norm2d

    n_valid, B, C, H, W = 5, 8, 3, 6, 7
    x_valid = rng.standard_normal((n_valid, C, H, W)).astype(np.float32)
    x_pad = np.concatenate([x_valid, np.zeros((B - n_valid, C, H, W), np.float32)])
    mask = np.zeros((B,), np.float32)
    mask[:n_valid] = 1.0

    weight = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)
    rm = rng.standard_normal(C).astype(np.float32)
    rv = rng.random(C).astype(np.float32) + 0.5

    out_u, m_u, v_u = batch_norm2d(
        jnp.asarray(x_valid), weight, bias, rm, rv, training=True
    )
    out_p, m_p, v_p = batch_norm2d(
        jnp.asarray(x_pad), weight, bias, rm, rv, training=True, mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_p)[:n_valid], np.asarray(out_u), rtol=1e-5, atol=1e-5
    )


def test_train_forward_padded_chunk_matches_unpadded(rng):
    """ConvNet (BN, no dropout/LSTM): loss + running-stat updates identical
    between a padded chunk with mask and the bare unpadded chunk."""
    from evfly_tpu.models.vitfly import ConvNet
    from evfly_tpu.train.stepfn import make_forward_loss

    model = ConvNet()
    params = model.init(jax.random.PRNGKey(0))
    fl = make_forward_loss(model, "vitfly", [10.0, 1.0], [5.0, -1.0], train=True)

    n_valid, B, H, W = 6, 8, 60, 90
    inp = rng.random((n_valid, 1, H, W)).astype(np.float32)
    gt_vel = rng.standard_normal((n_valid, 3)).astype(np.float32)
    desvel = np.full((n_valid, 1), 4.0, np.float32)

    def pad(a, fill=0.0):
        p = np.full((B - n_valid,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, p])

    batch_u = {
        "input": jnp.asarray(inp),
        "desvel": jnp.asarray(desvel),
        "gt_vel": jnp.asarray(gt_vel),
        "gt_frames": jnp.asarray(inp),
        "mask": jnp.ones((n_valid,), jnp.float32),
    }
    mask_p = np.zeros((B,), np.float32)
    mask_p[:n_valid] = 1.0
    batch_p = {
        "input": jnp.asarray(pad(inp)),
        "desvel": jnp.asarray(pad(desvel, fill=1.0)),
        "gt_vel": jnp.asarray(pad(gt_vel)),
        "gt_frames": jnp.asarray(pad(inp)),
        "mask": jnp.asarray(mask_p),
    }

    k = jax.random.PRNGKey(1)
    loss_u, (vals_u, updates_u, _, _) = fl(params, batch_u, k)
    loss_p, (vals_p, updates_p, _, _) = fl(params, batch_p, k)

    np.testing.assert_allclose(float(loss_p), float(loss_u), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_u), rtol=1e-5)
    assert set(updates_p) == set(updates_u)
    for key in updates_u:
        np.testing.assert_allclose(
            np.asarray(updates_p[key]), np.asarray(updates_u[key]),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )
