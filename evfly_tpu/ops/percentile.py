"""Fast per-frame percentile for event-frame rescaling.

The reference normalizes every event frame by the 97th percentile of |frame|
(dataloading.py:512-523, run.py:250-253, run_competition.py:488-494).
``jnp.quantile`` sorts — on TPU a full sort of 90k values per frame costs
more than the entire model forward (measured ~45 ms for 256 frames vs ~6 ms
for the ViTLSTM).  TPUs hate sorts; they love data-parallel passes.

``approx_abs_quantile`` replaces the sort with a branchless bisection on the
value axis: ``iters`` masked-count passes narrow the k-th order statistic to
``max|x| / 2^iters`` — with 16+ iterations the result is the exact order
statistic for quantized event data (thresholds are 0.2 steps).  The parity
paths keep jnp.quantile (torch linear-interpolation semantics); streaming /
throughput paths use this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("q", "iters"))
def approx_abs_quantile(frames: jnp.ndarray, q: float = 0.97, iters: int = 18) -> jnp.ndarray:
    """Per-frame approximate q-quantile of |frames|.

    frames: (B, ...) — quantile taken over all trailing dims.
    Returns (B,) values t_b ≈ the k-th smallest |x| with
    k = floor(q·(n-1)) + 1 (the lower order statistic of torch's
    linear-interpolated quantile).
    """
    B = frames.shape[0]
    flat = jnp.abs(frames.reshape(B, -1))
    n = flat.shape[1]
    k = jnp.floor(q * (n - 1)).astype(jnp.int32) + 1  # 1-indexed order stat

    lo = jnp.zeros((B,), flat.dtype)
    hi = jnp.max(flat, axis=1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(flat <= mid[:, None], axis=1)
        go_right = cnt < k
        return (jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid))

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    # sparse frames: when the k-th order statistic is exactly 0 the bisection
    # upper bound converges to max/2^iters instead of 0, which would blow a
    # near-empty frame up to clip saturation — snap to the exact 0 (keeps the
    # serving path consistent with the linear-interpolated parity quantile's
    # zero-fallback on sparse event frames)
    n_zero = jnp.sum(flat <= 0.0, axis=1)
    return jnp.where(n_zero >= k, 0.0, hi)
