"""ESIM event simulation tests: frame path vs discrete-event path consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from evfly_tpu.ops.esim import esim_event_frames, esim_events_list
from evfly_tpu.ops.voxelizer import event_frames_from_windows


def _moving_edge_frames(T=6, H=12, W=16):
    """A bright bar sweeping right: clean threshold crossings."""
    frames = np.full((T, H, W), 0.2, np.float32)
    for t in range(T):
        frames[t, :, 2 + 2 * t : 5 + 2 * t] = 0.9
    return frames


def test_esim_frames_quantized_and_signed():
    frames = _moving_edge_frames()
    ev = np.asarray(esim_event_frames(jnp.asarray(frames)))
    assert ev.shape == (5, 12, 16)
    nz = ev[ev != 0]
    assert len(nz) > 0
    # all values are multiples of the threshold
    np.testing.assert_allclose(nz / 0.2, np.round(nz / 0.2), atol=1e-4)
    assert (nz > 0).any() and (nz < 0).any()  # leading + trailing edges


def test_esim_reference_level_integrates():
    """A slow ramp below threshold per step still fires once accumulated."""
    T = 8
    frames = np.ones((T, 4, 4), np.float32) * np.exp(
        np.linspace(0.0, 0.5, T)
    ).reshape(-1, 1, 1) * 0.3
    ev = np.asarray(esim_event_frames(jnp.asarray(frames)))
    # total emitted quanta ≈ total log change quantized
    total = ev.sum(axis=0)[0, 0]
    assert total == pytest.approx(0.4, abs=0.21)  # 0.5 log units -> 2 quanta
    # plain per-pair difflog would emit nothing (each step below threshold)
    per_step = np.log(frames[1:] + 1e-10) - np.log(frames[:-1] + 1e-10)
    assert (np.abs(per_step) < 0.2).all()


def test_events_list_voxelizes_to_frames():
    """Discrete events -> Pallas windowed voxelizer == scan frame path."""
    frames = _moving_edge_frames()
    t_frames = np.arange(len(frames), dtype=np.float64) * 0.03
    ev_frames = np.asarray(esim_event_frames(jnp.asarray(frames)))

    t, x, y, p = esim_events_list(frames, t_frames)
    assert len(t) > 0
    vox = np.asarray(
        event_frames_from_windows(
            jnp.asarray(t, jnp.float32), jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32), jnp.asarray(p),
            jnp.asarray(t_frames[:-1], jnp.float32), jnp.asarray(t_frames[1:], jnp.float32),
            frames.shape[1], frames.shape[2],
        )
    )
    np.testing.assert_allclose(vox, ev_frames, atol=1e-4)
