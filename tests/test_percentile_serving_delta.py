"""Bound the serving-vs-parity percentile divergence END TO END.

bench.py and the streaming fast path scale event frames by the bisection
order statistic (ops/percentile.approx_abs_quantile); deployment parity uses
torch-linear-interpolation jnp.quantile (ops/percentile.py docstring).  These
tests pin the resulting contract:

1. on threshold-quantized event data (values = k · 0.2, the only data the
   serving path sees) the bisection result IS an exact order statistic, and
   the linear-interpolated quantile lies within one quantization step,
2. the end-to-end velocity delta through the full joint model
   (OrigUNet+ConvLSTM -> ViTLSTM) between the two scalings is small — the
   trade is a speed/accuracy knob, not a behavior change.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.ops.percentile import approx_abs_quantile


def _difflog_like_frames(rng, B=8, H=64, W=86, density=0.08):
    """Sparse threshold-quantized frames, like difflog output."""
    counts = rng.integers(-5, 6, size=(B, H, W)) * (rng.random((B, H, W)) < density)
    return (counts * 0.2).astype(np.float32)


def test_bisection_is_exact_order_statistic_on_quantized_data():
    rng = np.random.default_rng(0)
    frames = _difflog_like_frames(rng)
    fast = np.asarray(approx_abs_quantile(jnp.asarray(frames), 0.97))
    n = frames[0].size
    k = int(np.floor(0.97 * (n - 1))) + 1
    for b in range(len(frames)):
        exact_k = np.sort(np.abs(frames[b]).ravel())[k - 1]
        # 18 bisection iterations bracket the order statistic to max/2^18
        assert fast[b] == pytest.approx(exact_k, abs=2e-5), b
        # the parity quantile (linear interpolation) differs by at most one
        # 0.2 quantization step
        parity = np.quantile(np.abs(frames[b]), 0.97)
        assert abs(fast[b] - parity) <= 0.2 + 1e-6


@pytest.mark.slow
def test_end_to_end_velocity_delta_fast_vs_parity():
    from evfly_tpu.models.composites import OrigUNet_w_VITFLY_ViTLSTM
    from evfly_tpu.stream.pipeline import StreamingPipeline

    enc = {
        "num_layers": 2, "kernel_sizes": [5, 3], "kernel_strides": [2, 2],
        "out_channels": [8, 32], "activations": ["relu", "relu"],
        "pool_type": "max", "invert_pool_inputs": True,
        "pool_kernels": [2, 2], "pool_strides": [2, 2], "conv_function": "conv2d",
    }
    fc = {
        "num_layers": 4, "layer_sizes": [1024, 128, 16, 1],
        "activations": ["leaky_relu", "leaky_relu", "leaky_relu", "tanh"],
        "dropout_p": 0.1,
    }
    model = OrigUNet_w_VITFLY_ViTLSTM(
        num_in_channels=2, num_out_channels=1, num_recurrent=[1, 0],
        enc_params=enc, fc_params=fc, input_shape=[1, 1, 260, 346],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    frames = _difflog_like_frames(rng, B=6, H=260, W=346)

    fast_pipe = StreamingPipeline(model, params, desvel=4.0, fast_percentile=True)
    parity_pipe = StreamingPipeline(model, params, desvel=4.0, fast_percentile=False)

    deltas = []
    for t in range(len(frames)):
        vf, _ = fast_pipe.step_frame(jnp.asarray(frames[t]))
        vp, _ = parity_pipe.step_frame(jnp.asarray(frames[t]))
        deltas.append(np.abs(np.asarray(vf) - np.asarray(vp)).max())
    # carried hidden state included: the two scalings stay within 2% of
    # desired velocity of each other
    assert max(deltas) < 0.08, deltas
