"""bf16-encoder serving-rung acceptance A/B (VERDICT r3 #5).

Decides the BENCH_BF16ENC default on evidence: runs the ViTLSTM forward on
identical inputs with f32 weights and with the serving bf16 cast (encoder /
decoder / head in bf16, LSTM f32 — bench.py::bf16enc), and prints one JSON
line with the velocity deltas.  The serving tolerance is the deployment
contract scale: commands are vel*desvel with desvel~4 m/s and the sim
quantizes nothing finer than ~1e-2 m/s, so max|dvel| <= 5e-3 (normalized)
is acceptable.

  python tools/bf16_accept.py          # real TPU (leave JAX_PLATFORMS=axon)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from evfly_tpu.models.vitfly import LSTMNetVIT
    from evfly_tpu.ops.imageops import set_precision

    set_precision("default")
    model = LSTMNetVIT()
    params = model.init(jax.random.PRNGKey(0))

    def bf16enc(params):
        return {
            k: (
                v.astype(jnp.bfloat16)
                if v.dtype == jnp.float32 and not k.startswith("lstm.")
                else v
            )
            for k, v in params.items()
        }

    N = 256
    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.uniform(0, 1, (N, 1, 60, 90)), jnp.float32)
    desvel = jnp.full((N, 1), 4.0, jnp.float32)

    f32 = jax.jit(lambda p, s, d: model.apply(p, [s, d, None, None])[0])
    b16 = jax.jit(
        lambda p, s, d: model.apply(
            bf16enc(p), [s.astype(jnp.bfloat16), d, None, None]
        )[0]
    )
    vf = jax.device_get(f32(params, small, desvel))
    vb = jax.device_get(b16(params, small, desvel))
    dv = np.abs(vf - vb)
    tol = 5e-3
    print(
        json.dumps(
            {
                "windows": N,
                "max_abs_dvel_normalized": float(dv.max()),
                "mean_abs_dvel_normalized": float(dv.mean()),
                "max_abs_dvel_mps_at_desvel4": float(dv.max() * 4.0),
                "tolerance_normalized": tol,
                "accept": bool(dv.max() <= tol),
            }
        )
    )


if __name__ == "__main__":
    main()
