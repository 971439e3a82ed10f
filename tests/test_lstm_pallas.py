"""Fused single-kernel Pallas LSTM vs the lax.scan reference (models.recurrent.lstm_apply).

The fused kernel reorders the stacked-LSTM loops (all layers advanced per
time step instead of layer-by-layer whole-sequence scans) — mathematically
identical; these tests pin that equivalence plus the opt-in routing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.models import recurrent
from evfly_tpu.models.recurrent import lstm_apply, set_fused_lstm
from evfly_tpu.ops.lstm_pallas import lstm_apply_fused


def _torch_layout_params(rng, input_size, hidden, layers, bias=True):
    params = {}
    for l in range(layers):
        in_l = input_size if l == 0 else hidden
        params[f"weight_ih_l{l}"] = jnp.asarray(
            rng.normal(size=(4 * hidden, in_l)) * 0.2, jnp.float32
        )
        params[f"weight_hh_l{l}"] = jnp.asarray(
            rng.normal(size=(4 * hidden, hidden)) * 0.2, jnp.float32
        )
        if bias:
            params[f"bias_ih_l{l}"] = jnp.asarray(
                rng.normal(size=(4 * hidden,)) * 0.1, jnp.float32
            )
            params[f"bias_hh_l{l}"] = jnp.asarray(
                rng.normal(size=(4 * hidden,)) * 0.1, jnp.float32
            )
    return params


@pytest.mark.parametrize("mode", ["stacked", "wavefront"])
@pytest.mark.parametrize("layers", [1, 3])
@pytest.mark.parametrize("bias", [True, False])
def test_fused_matches_scan(layers, bias, mode):
    rng = np.random.default_rng(layers * 10 + bias)
    T, input_size, hidden = 17, 37, 128
    params = _torch_layout_params(rng, input_size, hidden, layers, bias)
    x = jnp.asarray(rng.normal(size=(T, input_size)), jnp.float32)

    out_ref, (h_ref, c_ref) = lstm_apply(params, x, None, layers, hidden)
    out_f, (h_f, c_f) = lstm_apply_fused(
        params, x, None, layers, hidden, mode=mode
    )

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref), atol=2e-5)


@pytest.mark.parametrize("mode", ["stacked", "wavefront"])
def test_fused_carried_hidden(mode):
    """Carried (h, c) across calls (the streaming recurrence contract):
    two fused T/2 segments == one scan pass over T."""
    rng = np.random.default_rng(7)
    T, input_size, hidden, layers = 16, 24, 128, 3
    params = _torch_layout_params(rng, input_size, hidden, layers)
    x = jnp.asarray(rng.normal(size=(T, input_size)), jnp.float32)

    out_ref, hid_ref = lstm_apply(params, x, None, layers, hidden)

    out_a, hid = lstm_apply_fused(
        params, x[: T // 2], None, layers, hidden, mode=mode
    )
    out_b, hid = lstm_apply_fused(
        params, x[T // 2 :], hid, layers, hidden, mode=mode
    )

    np.testing.assert_allclose(
        np.concatenate([np.asarray(out_a), np.asarray(out_b)]),
        np.asarray(out_ref),
        atol=3e-5,
    )
    np.testing.assert_allclose(np.asarray(hid[0]), np.asarray(hid_ref[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(hid[1]), np.asarray(hid_ref[1]), atol=3e-5)


@pytest.mark.parametrize("T", [1, 2])
def test_wavefront_edge_short_sequence(T):
    """T < L exercises the wavefront ramp-up/drain masking (layers idle at
    the triangle corners of the (layer, time) grid)."""
    rng = np.random.default_rng(21 + T)
    params = _torch_layout_params(rng, 9, 128, 3)
    x = jnp.asarray(rng.normal(size=(T, 9)), jnp.float32)
    out_ref, (h_ref, c_ref) = lstm_apply(params, x, None, 3, 128)
    out_f, (h_f, c_f) = lstm_apply_fused(
        params, x, None, 3, 128, mode="wavefront"
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref), atol=2e-5)


def test_unknown_mode_raises():
    rng = np.random.default_rng(2)
    params = _torch_layout_params(rng, 8, 128, 1)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    with pytest.raises(ValueError, match="mode"):
        lstm_apply_fused(params, x, None, 1, 128, mode="bogus")


def test_fused_requires_lane_aligned_hidden():
    rng = np.random.default_rng(0)
    params = _torch_layout_params(rng, 8, 64, 1)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    with pytest.raises(ValueError, match="128"):
        lstm_apply_fused(params, x, None, 1, 64)


def test_toggle_routes_and_skips_ineligible():
    """set_fused_lstm(True) routes eligible inference calls through the
    kernel; training calls and non-lane-aligned sizes keep the scan path
    (no error), and the toggle restores cleanly."""
    rng = np.random.default_rng(3)
    x128 = jnp.asarray(rng.normal(size=(5, 12)), jnp.float32)
    p128 = _torch_layout_params(rng, 12, 128, 2)
    p64 = _torch_layout_params(rng, 12, 64, 2)

    base_out, _ = lstm_apply(p128, x128, None, 2, 128)
    try:
        set_fused_lstm(True)
        assert recurrent._USE_FUSED_LSTM
        routed_out, _ = lstm_apply(p128, x128, None, 2, 128)
        np.testing.assert_allclose(
            np.asarray(routed_out), np.asarray(base_out), atol=2e-5
        )
        # ineligible hidden size: falls through to lax.scan, still works
        out64, _ = lstm_apply(p64, x128, None, 2, 64)
        assert out64.shape == (5, 64)
        # training path never routes through the inference kernel
        out_tr, _ = lstm_apply(
            p128, x128, None, 2, 128, dropout_p=0.5, train=True,
            rng=jax.random.PRNGKey(0),
        )
        assert out_tr.shape == (5, 128)
    finally:
        set_fused_lstm(False)
    assert not recurrent._USE_FUSED_LSTM
