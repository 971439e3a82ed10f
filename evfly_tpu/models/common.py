"""Shared model infrastructure: torch-compatible initializers + param helpers.

Parameters are FLAT dicts keyed exactly like the reference's PyTorch
``state_dict`` (e.g. ``"unet_e11.weight"``, ``"lstm.weight_ih_l0"``,
``"decoder.weight_orig"``), with tensors kept in torch layouts (OIHW conv
weights, (out,in) linear weights).  This makes porting a pretrained ``.pth``
a pure dtype cast (models/port.py) and keeps checkpoint round-trips exact
(SURVEY.md §5.4 contract).  Flat dicts of jnp arrays are ordinary pytrees, so
everything jits/grads/shards as usual.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def sub(params: Params, prefix: str) -> Params:
    """View of params under a key prefix (trace-time only, cheap)."""
    pre = prefix + "."
    return {k[len(pre):]: v for k, v in params.items() if k.startswith(pre)}


def merge(*parts: Tuple[str, Params]) -> Params:
    """Combine prefixed sub-param dicts into one flat dict."""
    out: Params = {}
    for prefix, p in parts:
        for k, v in p.items():
            out[f"{prefix}.{k}" if prefix else k] = v
    return out


def prefix_params(prefix: str, params: Params) -> Params:
    return {f"{prefix}.{k}": v for k, v in params.items()}


# ---------------------------------------------------------------------------
# torch-default initializers
# ---------------------------------------------------------------------------


def _kaiming_uniform_bound(fan_in: int) -> float:
    # torch kaiming_uniform_(a=sqrt(5)) => U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


def init_conv2d(
    key, in_ch: int, out_ch: int, kernel_size, bias: bool = True, groups: int = 1
) -> Params:
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    fan_in = (in_ch // groups) * kh * kw
    b = _kaiming_uniform_bound(fan_in)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (out_ch, in_ch // groups, kh, kw), jnp.float32, -b, b)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -b, b)
    return p


def init_conv_transpose2d(key, in_ch: int, out_ch: int, kernel_size, bias: bool = True) -> Params:
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    # torch fan_in for ConvTranspose2d weight (in, out, kh, kw) is out*kh*kw
    fan_in = out_ch * kh * kw
    b = _kaiming_uniform_bound(fan_in)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (in_ch, out_ch, kh, kw), jnp.float32, -b, b)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -b, b)
    return p


def init_linear(key, in_f: int, out_f: int, bias: bool = True) -> Params:
    b = _kaiming_uniform_bound(in_f)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (out_f, in_f), jnp.float32, -b, b)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_f,), jnp.float32, -b, b)
    return p


def init_spectral_linear(key, in_f: int, out_f: int, bias: bool = True) -> Params:
    """torch spectral_norm(Linear): weight_orig + power-iteration vectors u, v."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = init_linear(k1, in_f, out_f, bias)
    p = {"weight_orig": base["weight"]}
    if bias:
        p["bias"] = base["bias"]
    u = jax.random.normal(k2, (out_f,))
    v = jax.random.normal(k3, (in_f,))
    p["weight_u"] = u / (jnp.linalg.norm(u) + 1e-12)
    p["weight_v"] = v / (jnp.linalg.norm(v) + 1e-12)
    return p


def init_batchnorm2d(num_features: int) -> Params:
    return {
        "weight": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
        "running_mean": jnp.zeros((num_features,), jnp.float32),
        "running_var": jnp.ones((num_features,), jnp.float32),
        "num_batches_tracked": jnp.zeros((), jnp.int64),
    }


def init_layernorm(num_features: int) -> Params:
    return {
        "weight": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }


def init_lstm(
    key, input_size: int, hidden_size: int, num_layers: int, bias: bool = True
) -> Params:
    """torch nn.LSTM params: weight_ih_l{k} (4H, in), weight_hh_l{k} (4H, H)."""
    p: Params = {}
    b = 1.0 / math.sqrt(hidden_size)
    keys = jax.random.split(key, num_layers * 4)
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else hidden_size
        k_ih, k_hh, k_bi, k_bh = keys[layer * 4 : layer * 4 + 4]
        p[f"weight_ih_l{layer}"] = jax.random.uniform(
            k_ih, (4 * hidden_size, in_sz), jnp.float32, -b, b
        )
        p[f"weight_hh_l{layer}"] = jax.random.uniform(
            k_hh, (4 * hidden_size, hidden_size), jnp.float32, -b, b
        )
        if bias:
            p[f"bias_ih_l{layer}"] = jax.random.uniform(k_bi, (4 * hidden_size,), jnp.float32, -b, b)
            p[f"bias_hh_l{layer}"] = jax.random.uniform(k_bh, (4 * hidden_size,), jnp.float32, -b, b)
    return p


def is_trainable_key(key: str) -> bool:
    """Mask for optimizers: running stats / counters are not trained.

    Spectral-norm u/v vectors are power-iteration state, not gradients.
    """
    tail = key.rsplit(".", 1)[-1]
    return tail not in ("running_mean", "running_var", "num_batches_tracked", "weight_u", "weight_v")


def param_count(params: Params, trainable_only: bool = True) -> int:
    n = 0
    for k, v in params.items():
        if k.endswith("num_batches_tracked"):
            continue
        if trainable_only and not is_trainable_key(k):
            continue
        n += int(v.size)
    return n


def torch_param_count(params: Params) -> int:
    """Match ``sum(p.numel() for p in model.parameters())`` in torch.

    torch counts weight_orig but NOT the u/v buffers and NOT running stats.
    """
    n = 0
    for k, v in params.items():
        tail = k.rsplit(".", 1)[-1]
        if tail in ("running_mean", "running_var", "num_batches_tracked", "weight_u", "weight_v"):
            continue
        n += int(v.size)
    return n
