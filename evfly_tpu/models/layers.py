"""Configurable building blocks: DynamicConvNet / DynamicFCNet / VelPredictor.

Functional JAX equivalents of the reference's configurable builders
(learner_models.py:18-146,274-336) with state_dict-identical param keys
(``layers.conv2d_0.weight``, ``layers.fc_0.bias``, ...).

Faithfully-replicated reference quirk: DynamicConvNet registers its
"undo inversion after pooling" module under the SAME name as the
"invert before pooling" module (learner_models.py:77,92 both use
``f'invert_{i}'``), and ``nn.Module.add_module`` replaces in place — so the
built network inverts activations once *before* the pool and never undoes
it.  The shipped configs train with ``enc_invert_pool_inputs = True``, so the
pretrained weights depend on this exact behavior; we reproduce it rather
than the commented intent.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import ops
from .common import (
    Params,
    init_batchnorm2d,
    init_conv2d,
    init_conv_transpose2d,
    init_linear,
    prefix_params,
)

_ACTS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": ops.leaky_relu,
}


class DynamicConvNet:
    """Conv(-transpose) stack: conv(bias=False) → BN → act → [invert] → [pool]."""

    def __init__(
        self,
        in_channels: int,
        num_layers: int,
        kernel_sizes: List[int],
        kernel_strides: List[int],
        out_channels: List[int],
        activations: List[str],
        pool_type: str = "max",
        pool_kernels: Optional[List[int]] = None,
        pool_strides: Optional[List[int]] = None,
        conv_function: str = "conv2d",
        invert_pool_input: bool = False,
    ):
        assert len(kernel_sizes) == num_layers
        assert len(kernel_strides) == num_layers
        assert len(out_channels) == num_layers
        assert len(activations) == num_layers
        self.in_channels = in_channels
        self.num_layers = num_layers
        self.kernel_sizes = kernel_sizes
        self.kernel_strides = kernel_strides
        self.out_channels = out_channels
        self.activations = activations
        self.pool_type = pool_type
        self.pool_kernels = pool_kernels if pool_kernels is not None else [2] * num_layers
        self.pool_strides = pool_strides if pool_strides is not None else [2] * num_layers
        self.conv_function = conv_function
        self.invert_pool_input = invert_pool_input
        if conv_function not in ("conv2d", "upconv2d"):
            raise NotImplementedError(f"conv_function {conv_function}")

    def init(self, key) -> Params:
        p: Params = {}
        keys = jax.random.split(key, self.num_layers)
        cur = self.in_channels
        for i in range(self.num_layers):
            if self.conv_function == "conv2d":
                conv = init_conv2d(keys[i], cur, self.out_channels[i], self.kernel_sizes[i], bias=False)
            else:
                conv = init_conv_transpose2d(
                    keys[i], cur, self.out_channels[i], self.kernel_sizes[i], bias=False
                )
            p.update(prefix_params(f"layers.{self.conv_function}_{i}", conv))
            p.update(prefix_params(f"layers.batchnorm_{i}", init_batchnorm2d(self.out_channels[i])))
            cur = self.out_channels[i]
        return p

    def apply(
        self, params: Params, x: jnp.ndarray, train: bool = False, frame_mask=None
    ) -> Tuple[jnp.ndarray, Params]:
        """Returns (out, updated batch-norm state entries keyed at full paths).

        ``frame_mask`` (N,) marks valid frames of a padded chunk so BN batch
        statistics exclude padding (see ops.batch_norm2d).
        """
        updates: Params = {}
        for i in range(self.num_layers):
            w = params[f"layers.{self.conv_function}_{i}.weight"]
            if self.conv_function == "conv2d":
                x = ops.conv2d(x, w, None, stride=self.kernel_strides[i], padding=0)
            else:
                x = ops.conv_transpose2d(x, w, None, stride=self.kernel_strides[i], padding=0)
            bn = f"layers.batchnorm_{i}"
            x, new_m, new_v = ops.batch_norm2d(
                x,
                params[f"{bn}.weight"],
                params[f"{bn}.bias"],
                params[f"{bn}.running_mean"],
                params[f"{bn}.running_var"],
                training=train,
                mask=frame_mask,
            )
            if train:
                updates[f"{bn}.running_mean"] = new_m
                updates[f"{bn}.running_var"] = new_v
                updates[f"{bn}.num_batches_tracked"] = params[f"{bn}.num_batches_tracked"] + 1
            act = self.activations[i]
            if act != "none":
                x = _ACTS[act](x)
            if self.invert_pool_input:
                x = -x  # single invert (reference duplicate-name quirk; no undo)
            if self.conv_function == "conv2d" and self.pool_type != "none":
                if self.pool_type == "max":
                    x = ops.max_pool2d(x, self.pool_kernels[i], self.pool_strides[i])
                elif self.pool_type == "avg":
                    x = ops.avg_pool2d(x, self.pool_kernels[i], self.pool_strides[i])
                else:
                    raise NotImplementedError(self.pool_type)
        return x, updates

    def output_shape(self, input_hw: Tuple[int, int]) -> Tuple[int, int, int]:
        """Static shape math replacing the reference's random-tensor probing
        (learner_models.py:8-12 ``find_output_size``)."""
        h, w = input_hw
        for i in range(self.num_layers):
            k, s = self.kernel_sizes[i], self.kernel_strides[i]
            if self.conv_function == "conv2d":
                h = (h - k) // s + 1
                w = (w - k) // s + 1
                if self.pool_type != "none":
                    pk, ps = self.pool_kernels[i], self.pool_strides[i]
                    h = (h - pk) // ps + 1
                    w = (w - pk) // ps + 1
            else:
                h = (h - 1) * s + k
                w = (w - 1) * s + k
        return self.out_channels[-1], h, w


class DynamicFCNet:
    """FC stack: Linear → [dropout] → act (learner_models.py:102-145)."""

    def __init__(
        self,
        input_features: int,
        num_layers: int,
        layer_sizes: List[int],
        activations: List[str],
        dropout_p: Optional[float] = None,
    ):
        assert len(layer_sizes) == num_layers
        assert len(activations) == num_layers
        self.input_features = input_features
        self.num_layers = num_layers
        self.layer_sizes = layer_sizes
        self.activations = activations
        self.dropout_p = dropout_p

    def init(self, key) -> Params:
        p: Params = {}
        keys = jax.random.split(key, self.num_layers)
        cur = self.input_features
        for i, size in enumerate(self.layer_sizes):
            p.update(prefix_params(f"layers.fc_{i}", init_linear(keys[i], cur, size)))
            cur = size
        return p

    def apply(
        self, params: Params, x: jnp.ndarray, train: bool = False, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ops.linear(x, params[f"layers.fc_{i}.weight"], params[f"layers.fc_{i}.bias"])
            if self.dropout_p is not None and self.dropout_p > 0 and train and rng is not None:
                rng, sub_rng = jax.random.split(rng)
                x = ops.dropout(x, self.dropout_p, sub_rng, train)
            x = _ACTS[self.activations[i]](x)
        return x


class VelPredictor:
    """FC head emitting a unit-norm velocity 3-vector.

    For num_out in {1, 2} the missing leading component is completed as
    sqrt(1 - Σy²) with the radicand clipped to [0, 1]
    (learner_models.py:313-334); for num_out == 1 the z-component is zero.
    """

    def __init__(self, input_size: int = 512, num_out: int = 3, fc_params: Optional[dict] = None):
        if fc_params is None:
            fc_params = {
                "num_layers": 3,
                "layer_sizes": [128, 32, num_out],
                "activations": ["leaky_relu", "leaky_relu", "tanh"],
                "dropout_p": 0.1,
            }
        self.num_out = num_out
        self.fcnet = DynamicFCNet(
            input_features=input_size,
            num_layers=fc_params["num_layers"],
            layer_sizes=fc_params["layer_sizes"],
            activations=fc_params["activations"],
            dropout_p=fc_params["dropout_p"],
        )

    def init(self, key) -> Params:
        return prefix_params("fcnet", self.fcnet.init(key))

    def apply(self, params: Params, X, train: bool = False, rng=None):
        x = X[0]
        x = x.reshape(x.shape[0], -1)
        x = self.fcnet.apply({k[len("fcnet."):]: v for k, v in params.items()}, x, train, rng)
        if self.num_out == 2:
            radicand = 1.0 - jnp.sum(jnp.square(x), axis=1, keepdims=True)
            first = jnp.sqrt(jnp.clip(radicand, 0.0, 1.0))
            x = jnp.concatenate([first, x], axis=1)
        elif self.num_out == 1:
            radicand = 1.0 - jnp.square(x)
            first = jnp.sqrt(jnp.clip(radicand, 0.0, 1.0))
            zeros = jnp.zeros((x.shape[0], 1), x.dtype)
            x = jnp.concatenate([first, x, zeros], axis=1)
        return x, None
