"""Fused multi-layer LSTM scan as a single Pallas kernel.

The vitfly models run torch ``nn.LSTM`` over unbatched (T, features)
sequences (vitfly_models.py:111-150; models/recurrent.lstm_apply is the
parity implementation).  As three stacked ``lax.scan`` loops that is
768 sequential XLA while-loop iterations for the serving shape (3 layers x
256 windows), each doing one (1,H)x(H,4H) matvec — the computation is
latency-bound by loop overhead, not FLOPs (measured ~2.9 ms per 256-window
step, ~20x the matvec FLOP time).

TPU-native shape of the same recurrence: ONE kernel holding all layer
weights VMEM-resident, advancing ALL layers per time step (layer l+1 at
time t consumes layer l at time t, which is computed in the same
iteration — the standard stacked-LSTM reordering; identical math), with a
single in-kernel ``fori_loop`` over time.  The only remaining serial work
is the true dependency chain: one matvec + gate nonlinearities per
(layer, step).

Numerics match ``lstm_apply`` (gates ordered i, f, g, o — torch packing)
to f32 rounding: all matmuls accumulate in f32.  The layer-0 input
projection x @ W_ih0^T + b is hoisted OUT of the kernel as one big batched
MXU matmul, exactly like lstm_apply does.

Scope: inference (no inter-layer dropout), hidden_size a multiple of 128
(lane-aligned gate splits).  ``lstm_apply`` remains the general/training
path; serving paths opt in via models.recurrent.set_fused_lstm(True).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .imageops import PRECISION

# Kernel variant: "stacked" walks time steps, advancing layer 0..L-1
# sequentially inside each step (5 small dots per step for L=3);
# "wavefront" walks anti-diagonals of the (layer, time) grid — every layer
# advances simultaneously on its own time index via ONE block-diagonal
# matvec per wavefront, shrinking the serial dot chain from T*(2L-1) to
# T+L-1.  Identical math (each cell still consumes (l-1, t) and (l, t-1),
# both produced by the previous wavefront).  Selected per-call via
# lstm_apply_fused(mode=...) or globally via EVFLY_FLSTM_MODE.
FUSED_LSTM_MODE = os.environ.get("EVFLY_FLSTM_MODE", "stacked")


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_lstm_kernel(T: int, H: int, L: int):
    G = 4 * H

    def kernel(xp_ref, whh_ref, wih_ref, b_ref, h0_ref, c0_ref,
               out_ref, ht_ref, ct_ref):
        def dot(a, w):  # (1, H) x (H, G) -> (1, G), f32 accumulate
            return lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        h_init = tuple(h0_ref[l:l + 1, :] for l in range(L))
        c_init = tuple(c0_ref[l:l + 1, :] for l in range(L))

        def body(t, carry):
            hs, cs = carry
            xp = xp_ref[pl.ds(t, 1), :]  # (1, G) — layer-0 gates pre-matmul
            new_hs = []
            new_cs = []
            inp = None
            for l in range(L):
                if l == 0:
                    gates = xp
                else:
                    gates = (
                        dot(inp, wih_ref[:, (l - 1) * G:l * G])
                        + b_ref[0:1, (l - 1) * G:l * G]
                    )
                gates = gates + dot(hs[l], whh_ref[:, l * G:(l + 1) * G])
                i = jax.nn.sigmoid(gates[:, 0:H])
                f = jax.nn.sigmoid(gates[:, H:2 * H])
                g = jnp.tanh(gates[:, 2 * H:3 * H])
                o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
                c_new = f * cs[l] + i * g
                h_new = o * jnp.tanh(c_new)
                new_hs.append(h_new)
                new_cs.append(c_new)
                inp = h_new
            out_ref[pl.ds(t, 1), :] = new_hs[-1]
            return tuple(new_hs), tuple(new_cs)

        hs, cs = lax.fori_loop(0, T, body, (h_init, c_init))
        ht_ref[:] = jnp.zeros_like(ht_ref)
        ct_ref[:] = jnp.zeros_like(ct_ref)
        for l in range(L):
            ht_ref[l:l + 1, :] = hs[l]
            ct_ref[l:l + 1, :] = cs[l]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_layers", "hidden_size", "interpret")
)
def _lstm_fused(
    x_proj0: jnp.ndarray,   # (T, 4H) f32 — layer-0 input projection + bias
    whh_t: jnp.ndarray,     # (H, L*4H) f32 — per-layer W_hh^T, lane-concat
    wih_t: jnp.ndarray,     # (H, (L-1)*4H) f32 — W_ih^T of layers 1..L-1
    bias: jnp.ndarray,      # (8, (L-1)*4H) f32 — row 0 = b_ih+b_hh, layers 1..
    h0: jnp.ndarray,        # (8, H) f32 — rows 0..L-1 = per-layer h0
    c0: jnp.ndarray,        # (8, H)
    *,
    num_layers: int,
    hidden_size: int,
    interpret: bool,
):
    T = x_proj0.shape[0]
    H = hidden_size
    L = num_layers
    out, ht, ct = pl.pallas_call(
        _make_lstm_kernel(T, H, L),
        out_shape=(
            jax.ShapeDtypeStruct((T, H), jnp.float32),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * H * 4 * H * (2 * L - 1),
            bytes_accessed=(x_proj0.size + whh_t.size + wih_t.size + T * H) * 4,
            transcendentals=T * L * 4 * H,
        ),
    )(x_proj0, whh_t, wih_t, bias, h0, c0)
    return out, ht, ct


def _make_lstm_kernel_wavefront(T: int, H: int, L: int):
    G = 4 * H

    def kernel(xp_ref, wcomb_ref, b_ref, h0_ref, c0_ref,
               out_ref, ht_ref, ct_ref):
        def body(w, carry):
            h_cat, c_cat = carry  # (1, L*H) each; block l = layer l state
            # u = [h_cat | h_cat]: first copy feeds the recurrent (hh)
            # weights, second copy feeds the inter-layer (ih) weights of
            # layers 1..L-1 (block l reads u block L+l-1 = h_{l-1}).
            u = jnp.concatenate([h_cat, h_cat], axis=1)  # (1, 2*L*H)
            gates_all = lax.dot_general(
                u, wcomb_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[0:1, :]  # (1, L*G)
            # layer 0 consumes the precomputed input projection at t=w;
            # clamp the read past T — the result is masked off below
            xp = xp_ref[pl.ds(jnp.clip(w, 0, T - 1), 1), :]  # (1, G)
            new_h = []
            new_c = []
            for l in range(L):
                gl = gates_all[:, l * G:(l + 1) * G]
                if l == 0:
                    gl = gl + xp
                i = jax.nn.sigmoid(gl[:, 0:H])
                f = jax.nn.sigmoid(gl[:, H:2 * H])
                g = jnp.tanh(gl[:, 2 * H:3 * H])
                o = jax.nn.sigmoid(gl[:, 3 * H:4 * H])
                h_old = h_cat[:, l * H:(l + 1) * H]
                c_old = c_cat[:, l * H:(l + 1) * H]
                c_n = f * c_old + i * g
                h_n = o * jnp.tanh(c_n)
                # layer l is live on wavefront w iff 0 <= w - l < T
                active = jnp.logical_and(w >= l, w - l < T)
                new_h.append(jnp.where(active, h_n, h_old))
                new_c.append(jnp.where(active, c_n, c_old))
                if l == L - 1:
                    # top layer emits out[w-(L-1)]; clamped no-op rewrite
                    # of row 0 while the top layer hasn't started
                    idx = jnp.clip(w - (L - 1), 0, T - 1)
                    cur = out_ref[pl.ds(idx, 1), :]
                    out_ref[pl.ds(idx, 1), :] = jnp.where(active, h_n, cur)
            return (
                jnp.concatenate(new_h, axis=1),
                jnp.concatenate(new_c, axis=1),
            )

        init = (h0_ref[0:1, :], c0_ref[0:1, :])
        h_cat, c_cat = lax.fori_loop(0, T + L - 1, body, init)
        ht_ref[:] = jnp.zeros_like(ht_ref)
        ct_ref[:] = jnp.zeros_like(ct_ref)
        ht_ref[0:1, :] = h_cat
        ct_ref[0:1, :] = c_cat

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_layers", "hidden_size", "interpret")
)
def _lstm_fused_wavefront(
    x_proj0: jnp.ndarray,   # (T, 4H) f32 — layer-0 input projection + bias
    wcomb: jnp.ndarray,     # (2*L*H, L*4H) f32 block-diagonal packing
    bias: jnp.ndarray,      # (8, L*4H) f32 — row 0 = b_ih+b_hh, block 0 zero
    h0: jnp.ndarray,        # (8, L*H) f32 — row 0 = per-layer h0, lane-concat
    c0: jnp.ndarray,        # (8, L*H)
    *,
    num_layers: int,
    hidden_size: int,
    interpret: bool,
):
    T = x_proj0.shape[0]
    H = hidden_size
    L = num_layers
    out, ht, ct = pl.pallas_call(
        _make_lstm_kernel_wavefront(T, H, L),
        out_shape=(
            jax.ShapeDtypeStruct((T, H), jnp.float32),
            jax.ShapeDtypeStruct((8, L * H), jnp.float32),
            jax.ShapeDtypeStruct((8, L * H), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (T + L - 1) * (2 * L * H) * (4 * L * H),
            bytes_accessed=(x_proj0.size + wcomb.size + T * H) * 4,
            transcendentals=(T + L - 1) * L * 4 * H,
        ),
    )(x_proj0, wcomb, bias, h0, c0)
    return out, ht, ct


def lstm_apply_fused(
    params,
    x: jnp.ndarray,  # (T, input_size)
    hidden: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    num_layers: int,
    hidden_size: int,
    interpret: Optional[bool] = None,
    mode: Optional[str] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Drop-in inference replacement for models.recurrent.lstm_apply.

    Same param dict (torch nn.LSTM state_dict keys), same return signature
    (out (T, H), (h_n, c_n) each (L, H)).  Requires hidden_size % 128 == 0.
    mode: "stacked" | "wavefront" (None -> FUSED_LSTM_MODE module default).
    """
    if hidden_size % 128 != 0:
        raise ValueError(f"fused LSTM needs hidden_size % 128 == 0, got {hidden_size}")
    if interpret is None:
        interpret = _default_interpret()
    if mode is None:
        mode = FUSED_LSTM_MODE
    if mode not in ("stacked", "wavefront"):
        raise ValueError(f"unknown fused-LSTM mode {mode!r}")
    L, H = num_layers, hidden_size
    G = 4 * H
    if hidden is None:
        h0 = jnp.zeros((L, H), jnp.float32)
        c0 = jnp.zeros((L, H), jnp.float32)
    else:
        h0, c0 = hidden

    has_bias = "bias_ih_l0" in params

    # layer-0 input projection: one big batched MXU matmul (hoisted like
    # lstm_apply; everything recurrent happens inside the kernel)
    xp0 = jnp.matmul(
        x.astype(jnp.float32), params["weight_ih_l0"].T, precision=PRECISION
    )
    if has_bias:
        xp0 = xp0 + params["bias_ih_l0"] + params["bias_hh_l0"]

    if mode == "wavefront":
        # block-diagonal packing: rows [lH:(l+1)H] x cols [lG:(l+1)G] hold
        # W_hh_l^T; rows [(L+l-1)H:(L+l)H] x cols [lG:(l+1)G] hold W_ih_l^T
        # for l>=1 (layer 0's input arrives via xp0 inside the kernel)
        wcomb = jnp.zeros((2 * L * H, L * G), jnp.float32)
        for l in range(L):
            wcomb = wcomb.at[l * H:(l + 1) * H, l * G:(l + 1) * G].set(
                params[f"weight_hh_l{l}"].T.astype(jnp.float32)
            )
        for l in range(1, L):
            wcomb = wcomb.at[
                (L + l - 1) * H:(L + l) * H, l * G:(l + 1) * G
            ].set(params[f"weight_ih_l{l}"].T.astype(jnp.float32))
        brow = jnp.zeros((L * G,), jnp.float32)
        if has_bias:
            for l in range(1, L):
                brow = brow.at[l * G:(l + 1) * G].set(
                    params[f"bias_ih_l{l}"] + params[f"bias_hh_l{l}"]
                )
        bias = jnp.zeros((8, L * G), jnp.float32).at[0].set(brow)
        h0cat = jnp.zeros((8, L * H), jnp.float32).at[0].set(
            h0.astype(jnp.float32).reshape(-1)
        )
        c0cat = jnp.zeros((8, L * H), jnp.float32).at[0].set(
            c0.astype(jnp.float32).reshape(-1)
        )
        out, htc, ctc = _lstm_fused_wavefront(
            xp0, wcomb, bias, h0cat, c0cat,
            num_layers=L, hidden_size=H, interpret=interpret,
        )
        ht = htc[0].reshape(L, H)
        ct = ctc[0].reshape(L, H)
        return out.astype(x.dtype), (ht.astype(x.dtype), ct.astype(x.dtype))

    whh_t = jnp.concatenate(
        [params[f"weight_hh_l{l}"].T for l in range(L)], axis=1
    ).astype(jnp.float32)  # (H, L*4H)
    if L > 1:
        wih_t = jnp.concatenate(
            [params[f"weight_ih_l{l}"].T for l in range(1, L)], axis=1
        ).astype(jnp.float32)  # (H, (L-1)*4H)
        if has_bias:
            brow = jnp.concatenate(
                [
                    params[f"bias_ih_l{l}"] + params[f"bias_hh_l{l}"]
                    for l in range(1, L)
                ]
            )
        else:
            brow = jnp.zeros(((L - 1) * 4 * H,), jnp.float32)
    else:
        wih_t = jnp.zeros((H, 4 * H), jnp.float32)
        brow = jnp.zeros((4 * H,), jnp.float32)
    bias = jnp.zeros((8, brow.shape[0]), jnp.float32).at[0].set(brow)

    pad8 = jnp.zeros((8, H), jnp.float32)
    h0p = pad8.at[:L].set(h0.astype(jnp.float32))
    c0p = pad8.at[:L].set(c0.astype(jnp.float32))

    out, ht, ct = _lstm_fused(
        xp0, whh_t, wih_t, bias, h0p, c0p,
        num_layers=L, hidden_size=H, interpret=interpret,
    )
    return out.astype(x.dtype), (ht[:L].astype(x.dtype), ct[:L].astype(x.dtype))
