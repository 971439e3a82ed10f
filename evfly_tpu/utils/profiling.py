"""First-class profiling: stage timers + jax.profiler traces.

The reference's only tracing is ad-hoc ``time.time()`` deltas scattered
through training/eval/deployment (SURVEY.md §5.1).  Here profiling is a
subsystem: named stage timers with p50/p95 summaries (the north-star metrics
ARE windows/sec and p50 latency), a TPU-aware synchronizing timer (on the
axon tunnel only ``jax.device_get`` truly synchronizes — block_until_ready
returns early), and a context manager around ``jax.profiler`` for XLA-level
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage; reports percentiles."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None) -> Iterator[None]:
        """Time a block; pass a jax array as ``sync_value`` to force device
        completion before stopping the clock."""
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            import jax

            jax.device_get(sync_value)
        self.samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.samples.items():
            arr = np.array(vals)
            out[name] = {
                "count": len(arr),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<28}{'count':>7}{'mean':>10}{'p50':>10}{'p95':>10}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<28}{s['count']:>7}{s['mean_ms']:>9.2f}m{s['p50_ms']:>9.2f}m{s['p95_ms']:>9.2f}m"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_device_fn(fn, *args, n_iters: int = 10, warmup: int = 1):
    """Measure steady-state latency of a jitted fn on this backend.

    Chains n_iters calls and synchronizes once with device_get (the axon
    tunnel's ~30 ms RPC floor is amortized), returning seconds per call.
    """
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / n_iters
