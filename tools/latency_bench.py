"""p50 event→command latency of the full streaming step (north-star #2).

Measures the single-window path the deployment loop runs: raw events →
Pallas voxelize → percentile scale → OrigUNet (ConvLSTM bottleneck) →
ViTLSTM → velocity, with the recurrent carry donated.

On the axon tunnel only jax.device_get truly synchronizes (~30 ms RPC
floor), so we report both:
  * device compute latency: K chained steps / K (the on-chip number that
    governs achievable control rate when the host pipelines),
  * synchronous round-trip latency: per-step with device_get (what a
    host-blocking 15 Hz loop would see through this transport).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from evfly_tpu.models.composites import OrigUNet_w_VITFLY_ViTLSTM
    from evfly_tpu.ops.imageops import set_precision
    from evfly_tpu.ops.percentile import approx_abs_quantile
    from evfly_tpu.ops.voxelizer import event_histogram

    set_precision("default")

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
    H, W = 260, 346
    NE = 5000

    @jax.jit
    def step(params, ex, ey, ep, hidden, desvel):
        frame = event_histogram(ex, ey, ep, H, W)
        q = approx_abs_quantile(frame[None], 0.97)[0]
        frame = jnp.clip(frame / jnp.where(q > 0, q, 1.0), -1.0, 1.0)
        x = frame.reshape(1, 1, H, W)
        vel, (_d, _u, new_hidden), _ = model.apply(
            params, [x, desvel, hidden[0], hidden[1]], train=False
        )
        return vel[0], new_hidden

    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.uniform(0, W, NE), jnp.float32)
    ey = jnp.asarray(rng.uniform(0, H, NE), jnp.float32)
    ep = jnp.asarray(rng.choice([-1, 1], NE), jnp.int32)
    desvel = jnp.full((1, 1), 4.0, jnp.float32)
    hidden = model.init_hidden()

    vel, hidden = step(params, ex, ey, ep, hidden, desvel)
    jax.device_get(vel)

    # device compute latency (chained, one sync)
    K = 100
    t0 = time.perf_counter()
    for _ in range(K):
        vel, hidden = step(params, ex, ey, ep, hidden, desvel)
    jax.device_get(vel)
    compute_ms = (time.perf_counter() - t0) / K * 1e3

    # synchronous round-trip latency (per-step device_get)
    samples = []
    for _ in range(20):
        t0 = time.perf_counter()
        vel, hidden = step(params, ex, ey, ep, hidden, desvel)
        jax.device_get(vel)
        samples.append((time.perf_counter() - t0) * 1e3)
    p50_sync = float(np.percentile(samples, 50))

    # multi-stream serving throughput: G independent recurrent policies per
    # vmapped dispatch (BASELINE config 5 — "multi-stream batched") through
    # the FULL joint model on difflog frames
    from evfly_tpu.stream.pipeline import BatchedStreamingPipeline

    multi = {}
    for G in (16, 64, 128):
        pipe = BatchedStreamingPipeline(
            model, params, num_streams=G, desvel=4.0, fast_percentile=True
        )
        frames = jnp.asarray(
            (rng.integers(-3, 4, size=(G, H, W)) * (rng.random((G, H, W)) < 0.08)) * 0.2,
            jnp.float32,
        )
        vels, _ = pipe.step_frames(frames)
        jax.device_get(vels)
        K2 = 30
        t0 = time.perf_counter()
        for _ in range(K2):
            vels, _ = pipe.step_frames(frames)
        jax.device_get(vels)
        dt = time.perf_counter() - t0
        multi[f"streams_{G}"] = {
            "steps_per_sec": round(G * K2 / dt, 1),
            "ms_per_batched_step": round(dt / K2 * 1e3, 3),
            "streams_at_15hz": int(G * K2 / dt / 15.0),
        }

    print(
        json.dumps(
            {
                "device_compute_ms_per_step": round(compute_ms, 3),
                "sync_roundtrip_p50_ms": round(p50_sync, 3),
                "target_ms": 5.0,
                "multi_stream_joint": multi,
            }
        )
    )


if __name__ == "__main__":
    main()
