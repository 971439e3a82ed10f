"""Recurrent cells as lax.scan loops: torch-LSTM and ConvLSTM parity.

Sequence handling in the reference is recurrence, not attention-over-time
(SURVEY.md §5.7): the vitfly models run torch ``nn.LSTM`` over *unbatched*
(T, features) inputs — the chunk's batch dimension IS the time axis — and
OrigUNet runs a 1×1-kernel ConvLSTM over the bottleneck as a length-T
sequence with batch 1.  Both become `jax.lax.scan` with explicit (h, c)
carries, which is the TPU-native shape of the same computation: one compiled
step, no Python loops, carries donatable for streaming inference.

Gate-order parity matters and differs between the two:
* torch nn.LSTM packs gates (i, f, g, o)      — torch docs / ATen impl.
* the vendored ConvLSTM packs (i, f, o, g)    — ConvLSTM_pytorch/convlstm.py:44.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import ops
from .common import Params


# ---------------------------------------------------------------------------
# torch nn.LSTM (unbatched (T, input) sequences, multi-layer, optional bias)
# ---------------------------------------------------------------------------


_USE_FUSED_LSTM = False


def set_fused_lstm(enabled: bool) -> None:
    """Route eligible lstm_apply calls through the single-kernel Pallas scan
    (ops.lstm_pallas) — inference only, hidden_size % 128 == 0.  Serving /
    throughput paths opt in (bench.py); training and parity paths keep the
    lax.scan reference implementation.

    TRACE-TIME semantics: the flag is read when a jitted caller is TRACED,
    not when it runs.  Set it BEFORE the first call of any jitted function
    that should route through the kernel; flipping it afterwards has no
    effect on already-compiled traces (jit cache), and flipping it back does
    not restore them.  bench.py orders its rungs around this."""
    global _USE_FUSED_LSTM
    _USE_FUSED_LSTM = enabled


def lstm_apply(
    params: Params,
    x: jnp.ndarray,  # (T, input_size)
    hidden: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # (num_layers, H) each
    num_layers: int,
    hidden_size: int,
    dropout_p: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Multi-layer LSTM over an unbatched sequence; returns (out, (h_n, c_n)).

    Matches torch semantics: inter-layer dropout on all but the last layer's
    outputs (training only); gates ordered (i, f, g, o).
    """
    if _USE_FUSED_LSTM and not train and hidden_size % 128 == 0:
        from ..ops.lstm_pallas import lstm_apply_fused

        return lstm_apply_fused(params, x, hidden, num_layers, hidden_size)
    T = x.shape[0]
    if hidden is None:
        h0 = jnp.zeros((num_layers, hidden_size), x.dtype)
        c0 = jnp.zeros((num_layers, hidden_size), x.dtype)
    else:
        h0, c0 = hidden

    seq = x
    h_finals: List[jnp.ndarray] = []
    c_finals: List[jnp.ndarray] = []
    for layer in range(num_layers):
        w_ih = params[f"weight_ih_l{layer}"]
        w_hh = params[f"weight_hh_l{layer}"]
        b = None
        if f"bias_ih_l{layer}" in params:
            b = params[f"bias_ih_l{layer}"] + params[f"bias_hh_l{layer}"]

        # hoist the input projection out of the scan: one big MXU matmul
        x_proj = jnp.matmul(seq, w_ih.T, precision=ops.imageops.PRECISION)
        if b is not None:
            x_proj = x_proj + b

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.matmul(h, w_hh.T, precision=ops.imageops.PRECISION)
            i, f, g, o = jnp.split(gates, 4)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_T, c_T), outs = lax.scan(step, (h0[layer], c0[layer]), x_proj)
        h_finals.append(h_T)
        c_finals.append(c_T)
        seq = outs
        if layer < num_layers - 1 and dropout_p > 0.0 and train and rng is not None:
            rng, sub_rng = jax.random.split(rng)
            seq = ops.dropout(seq, dropout_p, sub_rng, train)

    return seq, (jnp.stack(h_finals), jnp.stack(c_finals))


def lstm_init_hidden(num_layers: int, hidden_size: int, dtype=jnp.float32):
    return (
        jnp.zeros((num_layers, hidden_size), dtype),
        jnp.zeros((num_layers, hidden_size), dtype),
    )


# ---------------------------------------------------------------------------
# ConvLSTM (vendored ConvLSTM_pytorch parity)
# ---------------------------------------------------------------------------


def init_convlstm(key, input_dim: int, hidden_dims: List[int], kernel_size, bias: bool) -> Params:
    """Params keyed like the vendored ConvLSTM: cell_list.{i}.conv.{weight,bias}."""
    from .common import init_conv2d, prefix_params

    p: Params = {}
    keys = jax.random.split(key, len(hidden_dims))
    cur = input_dim
    for i, hd in enumerate(hidden_dims):
        conv = init_conv2d(keys[i], cur + hd, 4 * hd, kernel_size, bias=bias)
        p.update(prefix_params(f"cell_list.{i}.conv", conv))
        cur = hd
    return p


def convlstm_apply(
    params: Params,
    x: jnp.ndarray,  # (B, T, C, H, W), batch_first
    hidden: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]],
    hidden_dims: List[int],
    kernel_size: Tuple[int, int],
) -> Tuple[jnp.ndarray, List[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """ConvLSTM forward; returns (last layer outputs (B,T,Ch,H,W), last states).

    Gate order (i, f, o, g) and 'same' padding per convlstm.py:29,44-53.
    """
    B, T, _, H, W = x.shape
    num_layers = len(hidden_dims)
    pad = (kernel_size[0] // 2, kernel_size[1] // 2)
    if hidden is None:
        hidden = [
            (
                jnp.zeros((B, hd, H, W), x.dtype),
                jnp.zeros((B, hd, H, W), x.dtype),
            )
            for hd in hidden_dims
        ]

    seq = jnp.swapaxes(x, 0, 1)  # (T, B, C, H, W) for scan
    last_states: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for layer in range(num_layers):
        w = params[f"cell_list.{layer}.conv.weight"]
        b = params.get(f"cell_list.{layer}.conv.bias")
        hd = hidden_dims[layer]

        def step(carry, x_t):
            h, c = carry
            combined = jnp.concatenate([x_t, h], axis=1)
            gates = ops.conv2d(combined, w, b, stride=1, padding=pad)
            cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=1)
            i = jax.nn.sigmoid(cc_i)
            f = jax.nn.sigmoid(cc_f)
            o = jax.nn.sigmoid(cc_o)
            g = jnp.tanh(cc_g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_T, c_T), outs = lax.scan(step, hidden[layer], seq)
        last_states.append((h_T, c_T))
        seq = outs

    return jnp.swapaxes(seq, 0, 1), last_states


def convlstm_init_hidden(batch: int, hidden_dims: List[int], H: int, W: int, dtype=jnp.float32):
    return [
        (jnp.zeros((batch, hd, H, W), dtype), jnp.zeros((batch, hd, H, W), dtype))
        for hd in hidden_dims
    ]
