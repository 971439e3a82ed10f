"""Streaming path tests: accumulator semantics + percentile + pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from evfly_tpu.ops.percentile import approx_abs_quantile
from evfly_tpu.stream.accumulator import EventAccumulator, frame_from_accumulated


@pytest.mark.parametrize("native", [False, None])
def test_accumulator_node_semantics(native):
    """±1 into uint8 base 128; drain resets; out-of-range dropped (node.cpp)."""
    acc = EventAccumulator(16, 20, native=native)
    x = np.array([3, 3, 3, 25, -1, 5])
    y = np.array([4, 4, 4, 2, 2, 18])
    p = np.array([1, 1, -1, 1, 1, 1])
    acc.accumulate(x, y, p)
    f = acc.drain()
    assert f[4, 3] == 129
    assert (acc.drain() == 128).all()


def test_accumulator_clamping():
    acc = EventAccumulator(4, 4, native=False)
    x = np.zeros(300, np.int32)
    y = np.zeros(300, np.int32)
    acc.accumulate(x, y, np.ones(300))
    assert acc.drain()[0, 0] == 255  # clamped (dv_ros node semantics)
    acc.accumulate(x, y, -np.ones(300))
    assert acc.drain()[0, 0] == 0


def test_frame_from_accumulated_scaling_and_crop():
    u8 = np.full((480, 640), 128, np.uint8)
    u8[240, 320] = 131
    ev = frame_from_accumulated(u8)
    assert ev.shape == (260, 346)
    assert ev[130, 173] == pytest.approx(0.6)  # (131-128)*0.2 maps to crop (130,173)
    assert np.count_nonzero(ev) == 1


def test_approx_quantile_matches_numpy(rng):
    x = (np.round(rng.standard_normal((3, 4000)) / 0.2) * 0.2).astype(np.float32)
    got = np.asarray(approx_abs_quantile(jnp.asarray(x), 0.97, iters=20))
    want = np.quantile(np.abs(x), 0.97, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_streaming_pipeline_smoke(rng):
    """Joint-model streaming step: carries hidden state, outputs sane shapes."""
    import jax

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
        enc_params=enc, fc_params=fc, input_shape=[1, 1, 196, 196],
        velpred=0, form_BEV=2, evs_min_cutoff=0.0, skip_type="interp",
    )
    params = model.init(jax.random.PRNGKey(0))
    pipe = StreamingPipeline(model, params, desvel=4.0, input_hw=(196, 196))
    frame = jnp.asarray(rng.standard_normal((196, 196)), jnp.float32)
    vel1, depth1 = pipe.step_frame(frame)
    vel2, depth2 = pipe.step_frame(frame)
    assert vel1.shape == (3,)
    assert depth1.shape == (196, 196)
    # recurrent carry evolves: same input, different hidden -> different output
    assert not np.allclose(np.asarray(vel1), np.asarray(vel2))
    pipe.reset()
    vel3, _ = pipe.step_frame(frame)
    np.testing.assert_allclose(np.asarray(vel3), np.asarray(vel1), atol=1e-5)

    # int8-voxelizer serving flag: raw events in, same contract out (the
    # int8-vs-bf16 bit-identity itself is pinned at the op level in
    # tests/test_fused_voxelizer.py::test_int8_matmul_matches_bf16)
    pipe8 = StreamingPipeline(
        model, params, desvel=4.0, input_hw=(196, 196), int8_voxelize=True
    )
    ex = jnp.asarray(rng.uniform(0, 196, 400), jnp.float32)
    ey = jnp.asarray(rng.uniform(0, 196, 400), jnp.float32)
    ep = jnp.asarray(rng.choice([-1, 1], 400), jnp.int32)
    vel_e, depth_e = pipe8.step_events(ex, ey, ep)
    assert vel_e.shape == (3,)
    assert depth_e.shape == (196, 196)


def test_stage_timer_percentiles():
    from evfly_tpu.utils.profiling import StageTimer

    t = StageTimer()
    for v in (0.01, 0.02, 0.03):
        t.record("render", v)
    t.record("model", 0.005)
    s = t.summary()
    assert s["render"]["count"] == 3
    assert s["render"]["p50_ms"] == pytest.approx(20.0)
    assert "model" in t.report()
