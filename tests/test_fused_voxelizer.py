"""Fused voxelize+percentile kernel (event_histogram_scaled) vs the unfused
composition (event_histogram -> approx_abs_quantile -> clip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.ops.imageops import interpolate_bilinear, interpolate_bilinear_mm
from evfly_tpu.ops.percentile import approx_abs_quantile
from evfly_tpu.ops.voxelizer import (
    event_histogram,
    event_histogram_scaled,
    event_histogram_scaled_resized,
)


@pytest.mark.parametrize("n_events", [0, 37, 5000])
def test_fused_matches_unfused(n_events):
    rng = np.random.default_rng(n_events)
    H, W = 64, 86
    x = jnp.asarray(rng.uniform(0, W, n_events), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H, n_events), jnp.float32)
    p = jnp.asarray(rng.choice([-1, 1], n_events), jnp.int32)

    fused = np.asarray(event_histogram_scaled(x, y, p, H, W))

    frame = event_histogram(x, y, p, H, W)
    q = approx_abs_quantile(frame[None], 0.97)[0]
    q = jnp.where(q > 0, q, 1.0)
    unfused = np.asarray(jnp.clip(frame / q, -1.0, 1.0))

    np.testing.assert_allclose(fused, unfused, atol=2e-5)


def test_fused_zero_quantile_fallback():
    """A frame whose 97th percentile is exactly zero (very sparse events)
    falls back to dividing the VALUE frame by 1.0 — run.py:252 semantics.
    Requires the bisection's exact-zero snap: without it the upper bound
    max/2^18 > 0 would blow the frame up to clip saturation."""
    H, W = 32, 40
    x = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)
    y = jnp.asarray([5.0, 5.0, 5.0], jnp.float32)
    p = jnp.asarray([1, 1, 1], jnp.int32)
    fused = np.asarray(event_histogram_scaled(x, y, p, H, W))
    assert fused[5, 3] == pytest.approx(min(3 * 0.2, 1.0))
    assert np.count_nonzero(fused) == 1


@pytest.mark.parametrize("n_events", [0, 37, 5000])
def test_resize_fused_matches_composition(n_events):
    """event_histogram_scaled_resized == interpolate_bilinear(
    event_histogram_scaled(...)) — the full serving input transform in one
    kernel (scratch accumulator + in-kernel quantile + matmul resize)."""
    rng = np.random.default_rng(7 + n_events)
    H, W = 64, 86
    ho, wo = 24, 30
    x = jnp.asarray(rng.uniform(0, W, n_events), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H, n_events), jnp.float32)
    p = jnp.asarray(rng.choice([-1, 1], n_events), jnp.int32)

    small = np.asarray(event_histogram_scaled_resized(x, y, p, H, W, ho, wo))
    assert small.shape == (ho, wo)

    full = event_histogram_scaled(x, y, p, H, W)
    ref = np.asarray(interpolate_bilinear(full[None, None], (ho, wo))[0, 0])
    np.testing.assert_allclose(small, ref, atol=3e-5)


def test_resize_fused_vmap_batch():
    """vmap over windows (the bench layout): each window's scratch
    accumulator re-zeroes at grid step 0, so batched results equal the
    per-window loop."""
    rng = np.random.default_rng(42)
    H, W = 48, 70
    B, E = 3, 900
    x = jnp.asarray(rng.uniform(0, W, (B, E)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H, (B, E)), jnp.float32)
    p = jnp.asarray(rng.choice([-1, 1], (B, E)), jnp.int32)

    batched = np.asarray(
        jax.vmap(
            lambda a, b, c: event_histogram_scaled_resized(a, b, c, H, W, 20, 26)
        )(x, y, p)
    )
    for i in range(B):
        single = np.asarray(
            event_histogram_scaled_resized(x[i], y[i], p[i], H, W, 20, 26)
        )
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_interpolate_bilinear_mm_matches_gather():
    """The separable-matmul resize equals the gather implementation (torch
    align_corners=False semantics) to f32 rounding, both down and up."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 260, 346)), jnp.float32)
    # atol 2e-4: the matmul accumulates n_in f32 terms (mostly zeros) where
    # the gather sums exactly 2 — rounding differs at ~1e-4 on O(1) values
    for size in [(60, 90), (260, 346), (300, 400), (1, 1)]:
        a = np.asarray(interpolate_bilinear(x, size))
        b = np.asarray(interpolate_bilinear_mm(x, size))
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=str(size))
    for size in [(60, 90), (130, 173)]:
        a = np.asarray(interpolate_bilinear(x, size, align_corners=True))
        b = np.asarray(interpolate_bilinear_mm(x, size, align_corners=True))
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=str(size))


@pytest.mark.parametrize("n_events", [0, 37, 5000])
def test_wide_layout_matches_default(n_events):
    """subchunks=1 with an 8x-wide chunk (ONE deep matmul per grid step —
    the serving-optimized layout, see _accumulate_subchunks) must produce
    the identical frame and quantile as the default 8-subchunk layout."""
    rng = np.random.default_rng(100 + n_events)
    H, W = 64, 86
    x = jnp.asarray(rng.uniform(0, W, n_events), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H, n_events), jnp.float32)
    p = jnp.asarray(rng.choice([-1, 1], n_events), jnp.int32)

    base = np.asarray(event_histogram(x, y, p, H, W, chunk=512))
    wide = np.asarray(event_histogram(x, y, p, H, W, chunk=4096, subchunks=1))
    np.testing.assert_allclose(wide, base, atol=1e-6)

    base_s = np.asarray(event_histogram_scaled(x, y, p, H, W, chunk=512))
    wide_s = np.asarray(
        event_histogram_scaled(x, y, p, H, W, chunk=4096, subchunks=1)
    )
    np.testing.assert_allclose(wide_s, base_s, atol=2e-5)


@pytest.mark.parametrize("n_events", [0, 37, 5000])
def test_int8_matmul_matches_bf16(n_events):
    """int8 one-hot matmuls (2x MXU rate) produce bit-identical frames:
    one-hot entries are exact in int8 and counts accumulate exactly in
    int32 before the f32 cast."""
    rng = np.random.default_rng(11 + n_events)
    H, W = 64, 86
    x = jnp.asarray(rng.uniform(0, W, n_events), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H, n_events), jnp.float32)
    p = jnp.asarray(rng.choice([-1, 1], n_events), jnp.int32)

    base = np.asarray(event_histogram_scaled(x, y, p, H, W))
    i8 = np.asarray(event_histogram_scaled(x, y, p, H, W, int8_mm=True))
    np.testing.assert_array_equal(i8, base)

    base_r = np.asarray(event_histogram_scaled_resized(x, y, p, H, W, 24, 30))
    i8_r = np.asarray(
        event_histogram_scaled_resized(x, y, p, H, W, 24, 30, int8_mm=True)
    )
    np.testing.assert_array_equal(i8_r, base_r)

    base_h = np.asarray(event_histogram(x, y, p, H, W))
    i8_h = np.asarray(event_histogram(x, y, p, H, W, int8_mm=True))
    np.testing.assert_array_equal(i8_h, base_h)
