"""Torch-semantics image/NN primitives on JAX.

The parity contract (BASELINE.md: outputs within 1e-3 of the PyTorch
reference with ported weights) hinges on reproducing PyTorch's exact
numerics for a handful of primitives the reference models use
(SURVEY.md §7.4 "hard parts"):

* valid/same-padding Conv2d on odd spatial sizes (NCHW / OIHW layouts),
* ConvTranspose2d output-size rules,
* MaxPool2d floor semantics,
* ``F.interpolate(mode='bilinear')`` for both align_corners=False
  (OrigUNet ``form_output``, dataloader resize) and align_corners=True
  (ViTLSTM's ``nn.Upsample``),
* LayerNorm / BatchNorm2d (train + eval), spectral_norm'd Linear,
* exact (erf) GELU — torch ``nn.GELU()`` default, NOT jax's tanh approx.

Everything here is shape-static and jit/pjit friendly.  Data layouts keep
torch conventions (NCHW activations, OIHW conv weights, (out,in) linear
weights) so ported ``state_dict`` tensors drop in without re-indexing;
XLA re-layouts for the MXU internally.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


# TPU matmul/conv units default to bf16 inputs; the 1e-3 PyTorch-parity
# contract requires full f32 ("highest") precision on the parity path.
# Perf-oriented callers (training from scratch, throughput benchmarks) may
# flip to DEFAULT (single-pass bf16) via set_precision().
PRECISION = lax.Precision.HIGHEST


def set_precision(mode: str) -> None:
    """Set the global matmul/conv precision: 'highest' (parity) or 'default'.

    'default' uses single-pass bf16 MXU ops — ~3-6x faster on TPU, outside
    the 1e-3 parity contract; use for from-scratch training and serving
    where bit-parity with the torch reference is not required.
    """
    global PRECISION
    PRECISION = {
        "highest": lax.Precision.HIGHEST,
        "float32": lax.Precision.HIGHEST,
        "default": lax.Precision.DEFAULT,
        "bfloat16": lax.Precision.DEFAULT,
    }[mode.lower()]


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


def conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding=0,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.functional.conv2d. x: (N,C,H,W), weight: (O, I/groups, kH, kW).

    ``padding`` may be an int, a pair, or the string 'same' (torch allows
    'same' only for stride=1, used by MixFFN's depthwise conv).
    """
    sh, sw = _pair(stride)
    if padding == "same":
        kh, kw = weight.shape[2], weight.shape[3]
        # torch 'same' puts the extra pad (for even kernels) on the right/bottom
        ph0, ph1 = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
        pw0, pw1 = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
        pad = ((ph0, ph1), (pw0, pw1))
    else:
        ph, pw = _pair(padding)
        pad = ((ph, ph), (pw, pw))
    out = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(sh, sw),
        padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=PRECISION,
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


def conv_transpose2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding=0,
) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose2d. weight: (I, O, kH, kW) (torch IOHW).

    Implemented as the gradient-of-conv identity: dilate input by stride,
    pad by (k-1-p), and convolve with the spatially-flipped, IO-transposed
    kernel.  Output size = (in-1)*stride - 2*pad + k, matching torch.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = weight.shape[2], weight.shape[3]
    w = jnp.flip(weight, axis=(2, 3)).transpose(1, 0, 2, 3)  # -> OIHW
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=PRECISION,
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


# ---------------------------------------------------------------------------
# Pooling (torch floor semantics == VALID reduce_window)
# ---------------------------------------------------------------------------


def max_pool2d(x: jnp.ndarray, kernel_size, stride=None) -> jnp.ndarray:
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding="VALID",
    )


def avg_pool2d(x: jnp.ndarray, kernel_size, stride=None) -> jnp.ndarray:
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    # literal 0 init so jax lowers to the differentiable reduce_window_sum
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding="VALID",
    )
    return summed / (kh * kw)


# ---------------------------------------------------------------------------
# Bilinear interpolation (torch F.interpolate parity, both align modes)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2))
def _interp_axis_weights(n_in: int, n_out: int, align_corners: bool):
    # returns (idx0, idx1, w1) vectors of length n_out
    i = jnp.arange(n_out, dtype=jnp.float32)
    if align_corners:
        if n_out == 1:
            src = jnp.zeros_like(i)
        else:
            src = i * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = (i + 0.5) * scale - 0.5
        src = jnp.maximum(src, 0.0)  # torch clamps negative source coords
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.minimum(i0, n_in - 1)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def interpolate_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """torch F.interpolate(x, size, mode='bilinear', align_corners=...).

    Separable gather implementation; exact torch edge handling (negative
    source coordinates clamp to 0 for align_corners=False).  x: (..., H, W).
    """
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-2], x.shape[-1]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h_in != h_out:
        i0, i1, w1 = _interp_axis_weights(h_in, h_out, align_corners)
        top = jnp.take(xf, i0, axis=-2)
        bot = jnp.take(xf, i1, axis=-2)
        wshape = (h_out, 1)
        xf = top * (1.0 - w1).reshape(wshape) + bot * w1.reshape(wshape)
    if w_in != w_out:
        j0, j1, v1 = _interp_axis_weights(w_in, w_out, align_corners)
        left = jnp.take(xf, j0, axis=-1)
        right = jnp.take(xf, j1, axis=-1)
        xf = left * (1.0 - v1) + right * v1
    return xf.astype(orig_dtype)


@functools.lru_cache(maxsize=64)
def resize_matrix(n_in: int, n_out: int, align_corners: bool = False, n_out_pad: int = 0):
    """Dense (n_out_pad or n_out, n_in) f32 matrix R with R @ v == the 1-D
    bilinear resample of v — identical source-coordinate/edge semantics to
    ``_interp_axis_weights`` (torch align_corners=False clamps negative
    source coords to 0).  Each row has <= 2 nonzeros; rows past n_out are
    zero padding (for TPU tile-aligned kernels).  numpy, trace-time constant.
    """
    import numpy as _np

    i = _np.arange(n_out, dtype=_np.float64)
    if align_corners:
        src = _np.zeros_like(i) if n_out == 1 else i * (n_in - 1) / (n_out - 1)
    else:
        src = _np.maximum((i + 0.5) * (n_in / n_out) - 0.5, 0.0)
    i0 = _np.minimum(_np.floor(src).astype(_np.int64), n_in - 1)
    i1 = _np.minimum(i0 + 1, n_in - 1)
    w1 = (src - i0).astype(_np.float64)
    rows = max(n_out_pad, n_out)
    R = _np.zeros((rows, n_in), _np.float32)
    _np.add.at(R, (_np.arange(n_out), i0), (1.0 - w1).astype(_np.float32))
    _np.add.at(R, (_np.arange(n_out), i1), w1.astype(_np.float32))
    R.setflags(write=False)  # lru_cache shares this array across callers
    return R


def interpolate_bilinear_mm(
    x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """``interpolate_bilinear`` as two MXU matmuls: out = R_h @ x @ R_w^T.

    The gather formulation above is exact but lowers to per-axis gathers
    that XLA:TPU executes poorly; a bilinear resample is a (<= 2 nonzeros
    per row) linear map, so a dense matmul is far cheaper on the MXU for
    serving-sized images.  Matmuls run at HIGHEST precision (f32 exact for
    these magnitudes) regardless of the global PRECISION so results match
    the gather path to f32 rounding.  x: (..., H, W).
    """
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-2], x.shape[-1]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h_in != h_out:
        rh = jnp.asarray(resize_matrix(h_in, h_out, align_corners))
        xf = jnp.einsum(
            "oh,...hw->...ow", rh, xf, precision=jax.lax.Precision.HIGHEST
        )
    if w_in != w_out:
        rw = jnp.asarray(resize_matrix(w_in, w_out, align_corners))
        xf = jnp.einsum(
            "...hw,ow->...ho", xf, rw, precision=jax.lax.Precision.HIGHEST
        )
    return xf.astype(orig_dtype)


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle: (N, C*r^2, H, W) -> (N, C, H*r, W*r)."""
    n, c_r2, h, w = x.shape
    r = upscale_factor
    c = c_r2 // (r * r)
    x = x.reshape(n, c, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, c, h * r, w * r)


# ---------------------------------------------------------------------------
# Linear / norms / activations
# ---------------------------------------------------------------------------


def linear(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None):
    """torch F.linear: weight (out, in)."""
    out = jnp.matmul(x, weight.T, precision=PRECISION)
    if bias is not None:
        out = out + bias
    return out


def spectral_sigma(weight: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """sigma = u^T W v with W flattened to (out, -1) — torch spectral_norm eval."""
    w_mat = weight.reshape(weight.shape[0], -1)
    return u @ (w_mat @ v)


def spectral_linear(
    x: jnp.ndarray,
    weight_orig: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
):
    """Linear layer wrapped in torch spectral_norm (eval semantics).

    torch stores ``weight_orig``/``weight_u``/``weight_v`` in the state_dict
    and computes weight = weight_orig / sigma with the *stored* u, v (no
    power iteration outside training).  Used by vitfly models
    (vitfly_models.py:88-90,123-126).
    """
    sigma = spectral_sigma(weight_orig, u, v)
    return linear(x, weight_orig / sigma, bias)


def spectral_norm_power_iteration(weight_orig, u, v, n_iters: int = 1, eps: float = 1e-12):
    """One (or more) torch-style power-iteration updates of (u, v).

    Call once per training step before the forward pass; torch performs the
    same update inside forward() when training.
    """
    w_mat = weight_orig.reshape(weight_orig.shape[0], -1)

    def body(_, uv):
        u_, v_ = uv
        v_ = w_mat.T @ u_
        v_ = v_ / (jnp.linalg.norm(v_) + eps)
        u_ = w_mat @ v_
        u_ = u_ / (jnp.linalg.norm(u_) + eps)
        return (u_, v_)

    u, v = lax.fori_loop(0, n_iters, body, (u, v))
    return u, v


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """torch nn.LayerNorm over the last dimension."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * weight + bias


def batch_norm2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
    mask=None,
):
    """torch nn.BatchNorm2d. Returns (out, new_running_mean, new_running_var).

    Training mode normalizes with biased batch statistics and updates the
    running stats with the unbiased variance (torch semantics).

    ``mask`` (optional, shape (N,), float 0/1) marks valid frames of a
    padded chunk: statistics are computed over valid frames only, so padded
    tail frames never touch batch stats or running stats — this makes the
    padded-chunk training step equal to the reference's ragged-chunk step
    (which simply has no padding).  Output normalization uses the masked
    stats for every frame; padded outputs are discarded by the masked loss.
    """
    if training:
        if mask is not None:
            m = mask.reshape(-1, 1, 1, 1).astype(x.dtype)
            count = jnp.maximum(jnp.sum(mask) * (x.shape[2] * x.shape[3]), 1.0)
            mean = jnp.sum(x * m, axis=(0, 2, 3)) / count
            var = (
                jnp.sum(jnp.square(x - mean.reshape(1, -1, 1, 1)) * m, axis=(0, 2, 3))
                / count
            )
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
        else:
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.mean(jnp.square(x - mean.reshape(1, -1, 1, 1)), axis=(0, 2, 3))
            n = x.shape[0] * x.shape[2] * x.shape[3]
            unbiased = var * (n / max(n - 1, 1))
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    inv = lax.rsqrt(var + eps).reshape(1, -1, 1, 1)
    out = (x - mean.reshape(1, -1, 1, 1)) * inv * weight.reshape(1, -1, 1, 1) + bias.reshape(
        1, -1, 1, 1
    )
    return out, new_mean, new_var


def dropout(x: jnp.ndarray, p: float, rng: Optional[jax.Array], training: bool):
    if not training or p <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def gelu_exact(x: jnp.ndarray):
    """torch nn.GELU() default (erf form) — jax.nn.gelu defaults to tanh approx."""
    return jax.nn.gelu(x, approximate=False)


def softmax(x: jnp.ndarray, axis: int = -1):
    return jax.nn.softmax(x, axis=axis)
