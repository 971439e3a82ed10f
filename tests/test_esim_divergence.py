"""Quantitative divergence bound: ops/esim.py vs the continuous ESIM model.

The reference generates events with the external CUDA esim_torch after
SuperSloMo upsampling (utils/to_events.py:165,188-244); our TPU-native
replacement interpolates linearly in log-intensity between frames
(ops/esim.py — documented divergence).  These tests bound that divergence
against a continuous-model oracle: the same contrast-threshold crossing
simulation run on a 20x temporally supersampled version of an ANALYTIC
stimulus (so the oracle sees sub-frame dynamics the frame-rate path cannot).

Envelope established here (the documented contract):
* per-window monotonic stimuli: frame-path output EXACTLY equals the oracle
  accumulated over the same windows (linear-in-log is exact for monotonic
  crossings; the carried reference makes counts path-independent),
* non-monotonic sub-window dynamics: the frame path only ever UNDERCOUNTS
  event MASS (it integrates the net log change; oscillation events are
  invisible at frame rate — same failure mode as any frame-interpolation
  event simulator, SuperSloMo included); per-pixel NET totals stay within
  two thresholds of the oracle's (carried-reference residuals),
* moving-edge textures at sim frame rates: per-window cosine similarity
  >= 0.95 and total-count ratio >= 0.9.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from evfly_tpu.ops.esim import esim_event_frames


def _oracle_counts(frames_hi: np.ndarray, windows: int, sub: int,
                   thresh: float = 0.2, eps: float = 1e-10):
    """Continuous-model oracle: carried-reference crossings on supersampled
    frames, accumulated per coarse window.  Returns (windows, H, W) signed
    threshold-count frames (x thresh)."""
    logs = np.log(frames_hi.astype(np.float64) + eps)
    ref = logs[0].copy()
    out = np.zeros((windows,) + frames_hi.shape[1:], np.float64)
    for i in range(1, len(frames_hi)):
        delta = logs[i] - ref
        n_pos = np.floor(np.maximum(delta, 0) / thresh)
        n_neg = np.floor(np.maximum(-delta, 0) / thresh)
        frame = thresh * (n_pos - n_neg)
        ref += frame
        out[(i - 1) // sub] += frame
    return out


def _run_both(intensity_fn, T=12, sub=20, H=8, W=8):
    """intensity_fn(t01, yy, xx) -> (H, W) intensity in (0, 1]."""
    yy, xx = np.mgrid[0:H, 0:W]
    t_hi = np.linspace(0.0, 1.0, (T - 1) * sub + 1)
    frames_hi = np.stack([intensity_fn(t, yy, xx) for t in t_hi])
    frames_lo = frames_hi[::sub]
    assert len(frames_lo) == T
    ours = np.asarray(esim_event_frames(jnp.asarray(frames_lo, jnp.float32)))
    oracle = _oracle_counts(frames_hi, windows=T - 1, sub=sub)
    return ours, oracle


def test_monotonic_ramp_exact():
    """Slow exponential ramp (linear in log): frame path == oracle exactly."""
    ours, oracle = _run_both(
        lambda t, yy, xx: 0.05 * np.exp(2.0 * t) * (1.0 + 0.1 * (xx + yy) / 14.0)
    )
    np.testing.assert_allclose(ours, oracle, atol=0.2 + 1e-6)  # ≤1 quantum anywhere
    # totals match to f32 rounding (ours runs float32, the oracle float64)
    np.testing.assert_allclose(ours.sum(0), oracle.sum(0), atol=1e-5)


def test_oscillation_undercounts_never_overcounts():
    """Sub-window sinusoid: the frame path misses oscillation events (both
    signs); net totals stay within TWO quanta (each path's carried reference
    ends within one threshold of the final log level, so the residuals can
    differ by up to 2θ)."""
    ours, oracle = _run_both(
        lambda t, yy, xx: 0.3 + 0.25 * np.sin(2 * np.pi * 7 * t + 0.3 * xx)
    )
    ours_mag = np.abs(ours).sum()
    oracle_mag = np.abs(oracle).sum()
    assert ours_mag <= oracle_mag + 1e-9, "frame path must not invent events"
    # net log change per pixel is what the frame path integrates
    np.testing.assert_allclose(ours.sum(0), oracle.sum(0), atol=0.4 + 1e-6)


def test_moving_edge_texture_correlation():
    """High-contrast edge sweeping across pixels at sim frame rate — the
    training-data regime (sim/render.py textures): corr >= 0.95,
    total event mass within 10% of the oracle."""

    def stim(t, yy, xx):
        edge = 4.0 + 24.0 * t  # edge position in pixels over the sequence
        return np.where(xx < edge, 0.8, 0.1) * (1.0 + 0.05 * np.sin(0.7 * yy))

    ours, oracle = _run_both(stim, T=12, sub=20, H=16, W=32)
    a, b = ours.ravel(), oracle.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos >= 0.95, f"per-window cosine similarity {cos:.3f}"
    ratio = float(np.abs(ours).sum() / max(np.abs(oracle).sum(), 1e-9))
    assert 0.9 <= ratio <= 1.0 + 1e-9, f"event-mass ratio {ratio:.3f}"


def test_counts_against_discrete_list_path():
    """The jitted frame path and the host discrete-event generator
    (esim_events_list) must agree exactly — same model, two materializations."""
    from evfly_tpu.ops.esim import esim_events_list

    rng = np.random.default_rng(0)
    T, H, W = 6, 5, 7
    frames = np.clip(rng.random((T, H, W)) * 0.8 + 0.1, 0.0, 1.0)
    ours = np.asarray(esim_event_frames(jnp.asarray(frames, jnp.float32)))
    ts, xs, ys, ps = esim_events_list(frames, np.arange(T, dtype=float))
    acc = np.zeros((T - 1, H, W))
    for t, x, y, p in zip(ts, xs, ys, ps):
        acc[int(np.floor(t)), int(y), int(x)] += 0.2 * p
    np.testing.assert_allclose(ours, acc, atol=1e-5)
