"""Event voxelization / accumulation — the Pallas "histogram as matmul" kernel.

The reference builds event frames as per-window 2D histograms scaled by the
contrast thresholds:

    frame = pos_th * hist2d(x_pos, y_pos) - neg_th * hist2d(x_neg, y_neg)

(`/root/reference/utils/to_events.py:400-412`,
 `/root/reference/utils/ev_utils.py:113-161` ``form_eventframe``), with
numpy.histogram2d semantics: bins=(W,H), range [[0,W],[0,H]] — i.e. bin index
floor(x), coordinates exactly == the right edge land in the last bin, anything
outside the range is dropped, and the result is transposed to (H, W).

TPU-native design
-----------------
A scatter-add is hostile to the TPU's vector/matrix units, but a histogram is
also a sum of outer products:  H = Σ_e v_e · onehot(y_e) ⊗ onehot(x_e)
                                 = Yᵀ X,
with Y (E, H) holding v_e at row e, column y_e, and X (E, W) the x one-hots.
That turns the whole voxelization into one MXU matmul per event chunk — no
atomics, no sort, perfectly shaped for the 128×128 systolic array.  One-hot
entries are ±1 (exactly representable in bf16); thresholds are applied once
at the end, so results match numpy bit-for-bit up to f32 accumulation.

The Pallas kernel tiles events into chunks, builds the one-hots in VMEM via
broadcasted iota compares, and accumulates the (H, W) frame across grid
steps in the output block.  A pure-XLA reference path (segment_sum) backs
CPU tests and serves as the fallback on non-TPU platforms.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _bin_events(
    x: jnp.ndarray, y: jnp.ndarray, pol: jnp.ndarray, H: int, W: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """np.histogram2d binning semantics -> (xi, yi, sign) int32/int32/f32.

    sign is +1 for positive polarity (pol > 0), -1 for negative (pol < 0),
    and 0 for ignored events (pol == 0, out-of-range, or padding).  Callers
    using a 0/1 polarity convention must map to ±1 first (as the reference's
    ``form_eventframe(all_events=True)`` does with p==0 meaning negative).
    """
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xi = jnp.where(xf >= W, W - 1, jnp.floor(xf)).astype(jnp.int32)
    yi = jnp.where(yf >= H, H - 1, jnp.floor(yf)).astype(jnp.int32)
    valid = (xf >= 0) & (xf <= W) & (yf >= 0) & (yf <= H)
    sign = jnp.where(pol > 0, 1.0, jnp.where(pol < 0, -1.0, 0.0)).astype(jnp.float32)
    sign = jnp.where(valid, sign, 0.0)
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    return xi, yi, sign


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


_SUBCHUNKS = 8  # sublane tiling: each grid step consumes 8 rows of E events


def _accumulate_subchunks(yi_ref, xi_ref, sign_ref, acc, H, W, int8_mm=False):
    """Accumulate this grid step's event rows into acc via one-hot matmuls.

    With S sub-chunk rows of E events each, the contraction axis of the
    histogram matmul IS the event index, so all S rows could be a single
    (H, S·E)x(S·E, W) product — but that needs an in-kernel (S, E)→(S·E,)
    relayout.  Instead callers choose the layout host-side:
      * subchunks=8, chunk=E   — 8 small matmuls (round-1 shape), full
        (8,128) input tiles;
      * subchunks=1, chunk=8E  — ONE deep matmul per grid step (K=8E on the
        MXU's contraction axis) and 2 big one-hot builds instead of 16 small
        ones; the (1, 8E) input blocks are sub-tile on sublanes (padded 8x)
        but the inputs are tiny next to the one-hots.  Measured faster — see
        bench.py BENCH_SUBCHUNKS.

    int8_mm runs the one-hot product as int8×int8→int32 (one-hot entries are
    ±1/0, exact in any dtype; counts fit int32 trivially) — 2× the MXU rate
    of the bf16 path on v5p.  The int32 partial is cast to f32 before the
    accumulate, so every downstream epilogue (quantile, resize) is unchanged
    and results stay bit-identical (counts ≪ 2^24).
    """
    S, E = yi_ref.shape
    for r in range(S):
        yi = yi_ref[r, :]  # (E,)
        xi = xi_ref[r, :]
        sign = sign_ref[r, :]
        # Y one-hot (H, E) carrying the signed value; X one-hot built
        # TRANSPOSED as (W, E) so xi stays a lane vector (xi[:, None] would
        # force a lane->sublane relayout); the matmul contracts both over
        # the shared event axis E — rhs-transposed contraction is native on
        # the MXU.
        row_ids = lax.broadcasted_iota(jnp.int32, (H, E), 0)
        w_ids = lax.broadcasted_iota(jnp.int32, (W, E), 0)
        if int8_mm:
            yoh = jnp.where(
                row_ids == yi[None, :], sign[None, :], 0.0
            ).astype(jnp.int8)
            xoh_t = (w_ids == xi[None, :]).astype(jnp.int8)
            acc = acc + lax.dot_general(
                yoh, xoh_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            continue
        yoh = jnp.where(row_ids == yi[None, :], sign[None, :], 0.0).astype(jnp.bfloat16)
        xoh_t = (w_ids == xi[None, :]).astype(jnp.bfloat16)
        acc = acc + lax.dot_general(
            yoh, xoh_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _make_hist_kernel(subchunks: int, int8_mm: bool = False):
    def kernel(yi_ref, xi_ref, sign_ref, out_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        H, W = out_ref.shape
        # constant-index output block stays VMEM-resident across grid steps
        out_ref[:] = _accumulate_subchunks(
            yi_ref, xi_ref, sign_ref, out_ref[:], H, W, int8_mm
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "chunk", "interpret", "subchunks", "int8_mm"),
)
def _hist_pallas(
    yi, xi, sign, *, H: int, W: int, chunk: int, interpret: bool,
    subchunks: int = _SUBCHUNKS, int8_mm: bool = False,
):
    n = yi.shape[0]
    step = chunk * subchunks
    n_pad = max(((n + step - 1) // step) * step, step)
    pad = n_pad - n
    yi = jnp.pad(yi, (0, pad))
    xi = jnp.pad(xi, (0, pad))
    sign = jnp.pad(sign, (0, pad))  # padded events have sign 0 -> no-op
    num_steps = n_pad // step
    yi = yi.reshape(num_steps * subchunks, chunk)
    xi = xi.reshape(num_steps * subchunks, chunk)
    sign = sign.reshape(num_steps * subchunks, chunk)

    grid = (num_steps,)
    ev_spec = pl.BlockSpec((subchunks, chunk), lambda i: (i, 0))
    out_spec = pl.BlockSpec((H, W), lambda i: (0, 0))
    return pl.pallas_call(
        _make_hist_kernel(subchunks, int8_mm),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid=grid,
        in_specs=[ev_spec, ev_spec, ev_spec],
        out_specs=out_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * n_pad,
            bytes_accessed=3 * n_pad * 4 + H * W * 4,
            transcendentals=0,
        ),
    )(yi, xi, sign)


def _make_hist_kernel_fused_quantile(
    q: float, iters: int, subchunks: int, int8_mm: bool = False
):
    """Histogram kernel + epilogue: the q-quantile of |counts| computed on
    the VMEM-resident accumulator in the LAST grid step (round-2 perf item:
    the separate percentile pass re-read every frame from HBM; here the
    bisection runs on the block that is already on-core).  Same order
    statistic as ops.percentile.approx_abs_quantile: k = floor(q·(n-1)) + 1,
    branchless value-axis bisection, ``iters`` masked-count passes."""

    def kernel(yi_ref, xi_ref, sign_ref, out_ref, q_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            # q output is a full (8, 128) f32 tile — the TPU's minimum VMEM
            # tile; a (1, 1) block is below the tiling floor and Mosaic
            # rejects it on hardware (round-2 bench ValueError).  The scalar
            # lives at [0, 0]; the rest of the tile is zero.
            q_ref[:] = jnp.zeros_like(q_ref)

        H, W = out_ref.shape
        acc = _accumulate_subchunks(
            yi_ref, xi_ref, sign_ref, out_ref[:], H, W, int8_mm
        )
        out_ref[:] = acc

        @pl.when(k == pl.num_programs(0) - 1)
        def _():
            a = jnp.abs(acc)
            n = H * W
            kth = int(q * (n - 1)) + 1  # floor(q·(n-1)) + 1, static
            lo0 = jnp.zeros((), jnp.float32)
            hi0 = jnp.max(a)

            def body(_, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum((a <= mid).astype(jnp.int32))
                go_right = cnt < kth
                return (
                    jnp.where(go_right, mid, lo),
                    jnp.where(go_right, hi, mid),
                )

            _, hi = lax.fori_loop(0, iters, body, (lo0, hi0))
            # exact-zero snap for sparse frames (see percentile.py): the
            # k-th order statistic of a near-empty frame is 0, not max/2^iters
            n_zero = jnp.sum((a <= 0.0).astype(jnp.int32))
            qv = jnp.where(n_zero >= kth, 0.0, hi)
            # broadcast the scalar over the whole tile: sub-tile scalar
            # stores are another Mosaic hazard; the wrapper reads [0, 0]
            q_ref[:] = jnp.full(q_ref.shape, qv, jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "chunk", "interpret", "q", "iters", "subchunks", "int8_mm"
    ),
)
def _hist_pallas_fused_quantile(
    yi, xi, sign, *, H: int, W: int, chunk: int, interpret: bool,
    q: float, iters: int, subchunks: int = _SUBCHUNKS, int8_mm: bool = False,
):
    n = yi.shape[0]
    step = chunk * subchunks
    n_pad = max(((n + step - 1) // step) * step, step)
    pad = n_pad - n
    yi = jnp.pad(yi, (0, pad))
    xi = jnp.pad(xi, (0, pad))
    sign = jnp.pad(sign, (0, pad))
    num_steps = n_pad // step
    yi = yi.reshape(num_steps * subchunks, chunk)
    xi = xi.reshape(num_steps * subchunks, chunk)
    sign = sign.reshape(num_steps * subchunks, chunk)

    ev_spec = pl.BlockSpec((subchunks, chunk), lambda i: (i, 0))
    counts, qval = pl.pallas_call(
        _make_hist_kernel_fused_quantile(q, iters, subchunks, int8_mm),
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        grid=(num_steps,),
        in_specs=[ev_spec, ev_spec, ev_spec],
        out_specs=(
            pl.BlockSpec((H, W), lambda i: (0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * n_pad + iters * H * W,
            bytes_accessed=3 * n_pad * 4 + H * W * 4,
            transcendentals=0,
        ),
    )(yi, xi, sign)
    return counts, qval[0, 0]


def event_histogram_scaled(
    x: jnp.ndarray,
    y: jnp.ndarray,
    pol: jnp.ndarray,
    H: int,
    W: int,
    thresh: float = 0.2,
    q: float = 0.97,
    iters: int = 18,
    chunk: int = 512,
    interpret: Optional[bool] = None,
    subchunks: int = _SUBCHUNKS,
    int8_mm: bool = False,
) -> jnp.ndarray:
    """Voxelize + 97th-percentile normalize in ONE fused Pallas kernel.

    Returns clip(frame / quantile(|frame|, q), ±1) — the deployment input
    transform (run.py:250-253) — without re-reading the frame from HBM for
    the percentile.  The scale factor thresh cancels: frame/qval =
    counts/qcounts, so the kernel works on raw signed counts.  Requires
    pos_thresh == neg_thresh (the shipped configs' ±0.2).
    """
    if interpret is None:
        interpret = _default_interpret()
    xi, yi, sign = _bin_events(x, y, pol, H, W)
    counts, qcnt = _hist_pallas_fused_quantile(
        yi, xi, sign, H=H, W=W, chunk=chunk, interpret=interpret, q=q,
        iters=iters, subchunks=subchunks, int8_mm=int8_mm,
    )
    # zero-quantile fallback divides the VALUE frame by 1.0 (run.py:252
    # semantics): values = thresh × counts there, 1/qcnt on counts otherwise
    scale = jnp.where(qcnt > 0, 1.0 / jnp.maximum(qcnt, 1e-30), thresh)
    return jnp.clip(counts * scale, -1.0, 1.0)


def _make_hist_kernel_fused_quantile_resize(
    q: float, iters: int, thresh: float, int8_mm: bool = False
):
    """Histogram + quantile-normalize + bilinear-downsample, all in VMEM.

    The full-resolution accumulator lives in VMEM *scratch* — it is never
    written to HBM at all.  The last grid step computes the q-quantile of
    |counts| (same bisection as ``_make_hist_kernel_fused_quantile``),
    normalizes+clips, and collapses the frame to the model's input size with
    two small MXU matmuls against trace-time-constant resize operators
    (imageops.resize_matrix — <=2 nonzeros/row bilinear maps, padded to TPU
    tile multiples so the output block is tile-aligned).  Per 256-window
    serving step this removes ~92 MB of HBM writes + ~92 MB of re-reads and
    the separate gather-based resize dispatch entirely.
    """

    def kernel(yi_ref, xi_ref, sign_ref, rh_ref, rwt_ref, small_ref, q_ref, acc_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            small_ref[:] = jnp.zeros_like(small_ref)
            q_ref[:] = jnp.zeros_like(q_ref)

        H, W = acc_ref.shape
        acc = _accumulate_subchunks(
            yi_ref, xi_ref, sign_ref, acc_ref[:], H, W, int8_mm
        )
        acc_ref[:] = acc

        @pl.when(k == pl.num_programs(0) - 1)
        def _():
            a = jnp.abs(acc)
            n = H * W
            kth = int(q * (n - 1)) + 1  # floor(q·(n-1)) + 1, static
            lo0 = jnp.zeros((), jnp.float32)
            hi0 = jnp.max(a)

            def body(_, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum((a <= mid).astype(jnp.int32))
                go_right = cnt < kth
                return (
                    jnp.where(go_right, mid, lo),
                    jnp.where(go_right, hi, mid),
                )

            _, hi = lax.fori_loop(0, iters, body, (lo0, hi0))
            n_zero = jnp.sum((a <= 0.0).astype(jnp.int32))
            qv = jnp.where(n_zero >= kth, 0.0, hi)
            # zero-quantile fallback: divide the VALUE frame (thresh*counts)
            # by 1.0 — run.py:252 semantics (same as event_histogram_scaled)
            scale = jnp.where(qv > 0, 1.0 / jnp.maximum(qv, 1e-30), thresh)
            scaled = jnp.clip(acc * scale, -1.0, 1.0)
            tmp = lax.dot_general(
                rh_ref[:], scaled, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (HP, W)
            small_ref[:] = lax.dot_general(
                tmp, rwt_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (HP, WP)
            q_ref[:] = jnp.full(q_ref.shape, qv, jnp.float32)

    return kernel


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "h_out", "w_out", "chunk", "interpret", "q", "iters",
        "subchunks", "thresh", "align_corners", "int8_mm",
    ),
)
def _hist_pallas_fused_quantile_resize(
    yi, xi, sign, *, H: int, W: int, h_out: int, w_out: int, chunk: int,
    interpret: bool, q: float, iters: int, thresh: float,
    subchunks: int = _SUBCHUNKS, align_corners: bool = False,
    int8_mm: bool = False,
):
    from evfly_tpu.ops.imageops import resize_matrix

    if not _HAS_PLTPU:
        # the kernel signature includes a VMEM scratch accumulator; without
        # jax.experimental.pallas.tpu there is nothing to pass for it (an
        # empty scratch list would arity-crash the 8-arg kernel) — fail
        # clearly instead (advisor r3)
        raise NotImplementedError(
            "event_histogram_scaled_resized requires jax.experimental.pallas.tpu "
            "(VMEM scratch accumulator); use event_histogram + interpolate_bilinear "
            "on builds without it"
        )

    n = yi.shape[0]
    step = chunk * subchunks
    n_pad = max(((n + step - 1) // step) * step, step)
    pad = n_pad - n
    yi = jnp.pad(yi, (0, pad))
    xi = jnp.pad(xi, (0, pad))
    sign = jnp.pad(sign, (0, pad))
    num_steps = n_pad // step
    yi = yi.reshape(num_steps * subchunks, chunk)
    xi = xi.reshape(num_steps * subchunks, chunk)
    sign = sign.reshape(num_steps * subchunks, chunk)

    # tile-aligned output: (8, 128) is the minimum f32 VMEM tile (the
    # round-2 lesson); zero rows/cols of the resize operators pad for free
    HP = _round_up(h_out, 8)
    WP = _round_up(w_out, 128)
    rh = jnp.asarray(resize_matrix(H, h_out, align_corners, n_out_pad=HP))
    rwt = jnp.asarray(resize_matrix(W, w_out, align_corners, n_out_pad=WP)).T

    ev_spec = pl.BlockSpec((subchunks, chunk), lambda i: (i, 0))
    small, qtile = pl.pallas_call(
        _make_hist_kernel_fused_quantile_resize(q, iters, thresh, int8_mm),
        out_shape=(
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        grid=(num_steps,),
        in_specs=[
            ev_spec,
            ev_spec,
            ev_spec,
            pl.BlockSpec((HP, H), lambda i: (0, 0)),
            pl.BlockSpec((W, WP), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((HP, WP), lambda i: (0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * n_pad + iters * H * W + 2 * HP * W * (H + WP),
            bytes_accessed=3 * n_pad * 4 + HP * WP * 4,
            transcendentals=0,
        ),
    )(yi, xi, sign, rh, rwt)
    return small, qtile[0, 0]


def event_histogram_scaled_resized(
    x: jnp.ndarray,
    y: jnp.ndarray,
    pol: jnp.ndarray,
    H: int,
    W: int,
    h_out: int,
    w_out: int,
    thresh: float = 0.2,
    q: float = 0.97,
    iters: int = 18,
    chunk: int = 512,
    interpret: Optional[bool] = None,
    subchunks: int = _SUBCHUNKS,
    align_corners: bool = False,
    int8_mm: bool = False,
) -> jnp.ndarray:
    """Events -> normalized (h_out, w_out) model input in ONE Pallas kernel.

    Equals ``interpolate_bilinear(event_histogram_scaled(...), (h_out,
    w_out))`` (the deployment transform run.py:250-253 + the 60x90 model
    resize, vitfly_models.py:18-31) to f32 rounding, but the (H, W) frame
    exists only in VMEM scratch — no HBM round-trip of the full-resolution
    frame and no separate resize dispatch.
    """
    if interpret is None:
        interpret = _default_interpret()
    xi, yi, sign = _bin_events(x, y, pol, H, W)
    small, _qcnt = _hist_pallas_fused_quantile_resize(
        yi, xi, sign, H=H, W=W, h_out=h_out, w_out=w_out, chunk=chunk,
        interpret=interpret, q=q, iters=iters, thresh=thresh,
        subchunks=subchunks, align_corners=align_corners, int8_mm=int8_mm,
    )
    return small[:h_out, :w_out]


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def event_histogram(
    x: jnp.ndarray,
    y: jnp.ndarray,
    pol: jnp.ndarray,
    H: int,
    W: int,
    pos_thresh: float = 0.2,
    neg_thresh: float = 0.2,
    chunk: int = 512,
    interpret: Optional[bool] = None,
    subchunks: int = _SUBCHUNKS,
    int8_mm: bool = False,
) -> jnp.ndarray:
    """Voxelize one window of events into an (H, W) float32 event frame.

    Exactly reproduces the reference's
    ``pos_th*hist2d(pos).T - neg_th*hist2d(neg).T``
    (to_events.py:409, ev_utils.py:139) on the TPU MXU.

    When pos_thresh != neg_thresh the signed single-pass trick no longer
    factorizes; we then run two accumulation passes with masked signs.
    """
    if interpret is None:
        interpret = _default_interpret()
    xi, yi, sign = _bin_events(x, y, pol, H, W)
    if pos_thresh == neg_thresh:
        counts = _hist_pallas(
            yi, xi, sign, H=H, W=W, chunk=chunk, interpret=interpret,
            subchunks=subchunks, int8_mm=int8_mm,
        )
        return pos_thresh * counts
    pos_counts = _hist_pallas(
        yi, xi, jnp.maximum(sign, 0.0), H=H, W=W, chunk=chunk,
        interpret=interpret, subchunks=subchunks, int8_mm=int8_mm,
    )
    neg_counts = _hist_pallas(
        yi, xi, jnp.maximum(-sign, 0.0), H=H, W=W, chunk=chunk,
        interpret=interpret, subchunks=subchunks, int8_mm=int8_mm,
    )
    return pos_thresh * pos_counts - neg_thresh * neg_counts


def event_histogram_reference(
    x: jnp.ndarray,
    y: jnp.ndarray,
    pol: jnp.ndarray,
    H: int,
    W: int,
    pos_thresh: float = 0.2,
    neg_thresh: float = 0.2,
) -> jnp.ndarray:
    """Pure-XLA oracle with identical semantics (scatter-add / segment_sum)."""
    xi, yi, sign = _bin_events(x, y, pol, H, W)
    pid = yi * W + xi
    vals = jnp.where(sign > 0, pos_thresh, jnp.where(sign < 0, -neg_thresh, 0.0))
    flat = jax.ops.segment_sum(vals, pid, num_segments=H * W)
    return flat.reshape(H, W)


def event_frames_from_windows(
    t: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    pol: jnp.ndarray,
    window_starts: jnp.ndarray,
    window_ends: jnp.ndarray,
    H: int,
    W: int,
    pos_thresh: float = 0.2,
    neg_thresh: float = 0.2,
    chunk: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Voxelize many time windows of one event stream -> (T, H, W) frames.

    Reproduces the reference's per-inter-frame-window slicing loop
    (to_events.py:398-412: ``ts >= t_start & ts < t_end``) as a batched,
    jit-friendly computation: each window masks the shared event arrays by
    time (events outside the window contribute sign 0) and runs the Pallas
    histogram.  Windows are mapped with lax.map to bound memory.
    """
    if interpret is None:
        interpret = _default_interpret()

    def one_window(se):
        t0, t1 = se
        in_win = (t >= t0) & (t < t1)
        p = jnp.where(in_win, pol, 0)
        return event_histogram(
            x, y, p, H, W, pos_thresh, neg_thresh, chunk=chunk, interpret=interpret
        )

    return lax.map(one_window, (window_starts, window_ends))


def difflog_events(
    im: jnp.ndarray,
    prev_im: jnp.ndarray,
    pos_thresh: float = 0.2,
    neg_thresh: float = 0.2,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Difflog event approximation between two intensity frames.

    Mirrors run_competition.py:603-635 ``compute_events`` (eps 1e-5) and
    to_events.py:419-439: difflog = log(im+eps)-log(prev+eps), quantized by
    the thresholds (floor-division toward -inf, matching ``//``), and zeroed
    entirely when ``max |difflog| < max(pos_th, neg_th)``.
    """
    difflog = jnp.log(im + eps) - jnp.log(prev_im + eps)
    pos = jnp.floor(difflog / pos_thresh) * pos_thresh
    neg = jnp.floor(difflog / -neg_thresh) * -neg_thresh
    ev = jnp.where(difflog > 0.0, pos, jnp.where(difflog < 0.0, neg, 0.0))
    any_event = jnp.max(jnp.abs(difflog)) >= max(pos_thresh, neg_thresh)
    return jnp.where(any_event, ev, jnp.zeros_like(ev))
