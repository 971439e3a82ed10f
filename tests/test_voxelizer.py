"""Voxelizer tests: Pallas histogram kernel vs numpy.histogram2d semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from evfly_tpu.ops import voxelizer


def _numpy_oracle(x, y, pol, H, W, pos_th=0.2, neg_th=0.2):
    """Exact reference computation (ev_utils.py:139)."""
    pos = pol > 0
    neg = pol < 0
    hp = np.histogram2d(x[pos], y[pos], bins=(W, H), range=[[0, W], [0, H]])[0]
    hn = np.histogram2d(x[neg], y[neg], bins=(W, H), range=[[0, W], [0, H]])[0]
    return (pos_th * hp - neg_th * hn).T


@pytest.mark.parametrize("n_events", [0, 1, 1000, 5000])
def test_histogram_matches_numpy(rng, n_events):
    H, W = 60, 90
    x = rng.uniform(0, W, n_events).astype(np.float32)
    y = rng.uniform(0, H, n_events).astype(np.float32)
    pol = rng.choice([-1, 1], n_events).astype(np.int32)
    oracle = _numpy_oracle(x, y, pol, H, W)
    ours = voxelizer.event_histogram(jnp.array(x), jnp.array(y), jnp.array(pol), H, W)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-5)
    ref = voxelizer.event_histogram_reference(jnp.array(x), jnp.array(y), jnp.array(pol), H, W)
    np.testing.assert_allclose(np.asarray(ref), oracle, atol=1e-5)


def test_histogram_edge_semantics(rng):
    """x == W lands in the last bin; out-of-range events are dropped."""
    H, W = 8, 16
    x = np.array([W, W - 0.001, -0.5, W + 0.5, 0.0, 3.999], np.float32)
    y = np.array([H, 0, 2, 2, H + 1, 3.2], np.float32)
    pol = np.array([1, 1, 1, 1, 1, -1], np.int32)
    oracle = _numpy_oracle(x, y, pol, H, W)
    ours = voxelizer.event_histogram(jnp.array(x), jnp.array(y), jnp.array(pol), H, W)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-6)
    assert oracle[H - 1, W - 1] == pytest.approx(0.2)  # the x==W, y==H event


def test_histogram_asymmetric_thresholds(rng):
    H, W = 20, 30
    n = 2000
    x = rng.uniform(0, W, n).astype(np.float32)
    y = rng.uniform(0, H, n).astype(np.float32)
    pol = rng.choice([-1, 1], n).astype(np.int32)
    oracle = _numpy_oracle(x, y, pol, H, W, pos_th=0.3, neg_th=0.15)
    ours = voxelizer.event_histogram(
        jnp.array(x), jnp.array(y), jnp.array(pol), H, W, pos_thresh=0.3, neg_thresh=0.15
    )
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-5)


def test_windowed_frames(rng):
    """Batched windowing reproduces the reference's per-window slicing loop."""
    H, W = 16, 24
    n = 3000
    t = np.sort(rng.uniform(0, 1.0, n)).astype(np.float32)
    x = rng.uniform(0, W, n).astype(np.float32)
    y = rng.uniform(0, H, n).astype(np.float32)
    pol = rng.choice([-1, 1], n).astype(np.int32)
    starts = np.array([0.0, 0.25, 0.5, 0.75], np.float32)
    ends = np.array([0.25, 0.5, 0.75, 1.0], np.float32)
    frames = voxelizer.event_frames_from_windows(
        jnp.array(t), jnp.array(x), jnp.array(y), jnp.array(pol),
        jnp.array(starts), jnp.array(ends), H, W,
    )
    assert frames.shape == (4, H, W)
    for i in range(4):
        sel = (t >= starts[i]) & (t < ends[i])
        oracle = _numpy_oracle(x[sel], y[sel], pol[sel], H, W)
        np.testing.assert_allclose(np.asarray(frames[i]), oracle, atol=1e-5)
    # windows tile the stream: sums must match the all-events histogram
    total = _numpy_oracle(x, y, pol, H, W)
    np.testing.assert_allclose(np.asarray(frames).sum(0), total, atol=1e-4)


def test_difflog_matches_reference_semantics(rng):
    """difflog quantization vs the reference formula (run_competition.py:603-635)."""
    im = rng.random((13, 17)).astype(np.float32)
    prev = rng.random((13, 17)).astype(np.float32)
    eps, pth, nth = 1e-5, 0.2, 0.2
    difflog = np.log(im + eps) - np.log(prev + eps)
    oracle = np.zeros_like(difflog)
    if np.abs(difflog).max() >= max(pth, nth):
        pos = difflog > 0
        neg = difflog < 0
        oracle[pos] = (difflog[pos] // pth) * pth
        oracle[neg] = (difflog[neg] // -nth) * -nth
    ours = voxelizer.difflog_events(jnp.array(im), jnp.array(prev))
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-5)


def test_difflog_below_threshold_is_zero():
    im = np.full((5, 5), 0.5, np.float32)
    prev = np.full((5, 5), 0.5001, np.float32)
    out = voxelizer.difflog_events(jnp.array(im), jnp.array(prev))
    assert np.all(np.asarray(out) == 0.0)
