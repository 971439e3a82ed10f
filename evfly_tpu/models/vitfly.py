"""The vitfly model zoo: depth→velocity V(φ) policies.

Functional parity with vitfly_models.py (ConvNet :33, LSTMNet :72,
LSTMNetVIT :111 — the paper's V(φ) — ViT :152, UNetConvLSTMNet :188).
All consume X = [depth (N,1,H,W), desvel (N,1), quat (N,4)|None, hidden].
``refine_inputs`` resizes inputs to 60×90 and fills identity quaternions
(vitfly_models.py:18-31).

The torch LSTMs run over *unbatched* (N, features) input — the chunk/batch
axis is the time axis — so hidden states are (num_layers, hidden_size).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import ops
from .common import (
    Params,
    init_batchnorm2d,
    init_conv2d,
    init_conv_transpose2d,
    init_linear,
    init_lstm,
    init_spectral_linear,
    prefix_params,
    sub,
)
from .recurrent import lstm_apply
from .vit import MixTransformerEncoderLayer


def refine_inputs(X):
    """Resize depth to 60×90; default quat to identity (vitfly_models.py:18)."""
    X = list(X)
    if X[2] is None:
        q = jnp.zeros((X[0].shape[0], 4), jnp.float32)
        X[2] = q.at[:, 0].set(1.0)
    if X[0].shape[-2] != 60 or X[0].shape[-1] != 90:
        X[0] = ops.interpolate_bilinear(X[0], (60, 90), align_corners=False)
    return X


def _bn(params, prefix, x, train, updates, mask=None):
    out, m, v = ops.batch_norm2d(
        x,
        params[f"{prefix}.weight"],
        params[f"{prefix}.bias"],
        params[f"{prefix}.running_mean"],
        params[f"{prefix}.running_var"],
        training=train,
        mask=mask,
    )
    if train:
        updates[f"{prefix}.running_mean"] = m
        updates[f"{prefix}.running_var"] = v
        updates[f"{prefix}.num_batches_tracked"] = params[f"{prefix}.num_batches_tracked"] + 1
    return out


def _speclin(params, prefix, x):
    return ops.spectral_linear(
        x,
        params[f"{prefix}.weight_orig"],
        params[f"{prefix}.weight_u"],
        params[f"{prefix}.weight_v"],
        params.get(f"{prefix}.bias"),
    )


class ConvNet:
    """Conv+FC network, 235,269 params (vitfly_models.py:33-70)."""

    def init(self, key) -> Params:
        ks = jax.random.split(key, 6)
        p = prefix_params("conv1", init_conv2d(ks[0], 1, 4, 3))
        p.update(prefix_params("conv2", init_conv2d(ks[1], 4, 10, 3)))
        p.update(prefix_params("bn1", init_batchnorm2d(4)))
        p.update(prefix_params("fc0", init_linear(ks[2], 845, 256, bias=False)))
        p.update(prefix_params("fc1", init_linear(ks[3], 256, 64, bias=False)))
        p.update(prefix_params("fc2", init_linear(ks[4], 64, 32, bias=False)))
        p.update(prefix_params("fc3", init_linear(ks[5], 32, 3)))
        return p

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        X = refine_inputs(X)
        updates: Params = {}
        x = ops.conv2d(X[0], params["conv1.weight"], params["conv1.bias"], stride=3)
        x = _bn(params, "bn1", jax.nn.relu(x), train, updates, frame_mask)
        x = -ops.max_pool2d(-x, 2, 1)
        x = ops.conv2d(x, params["conv2.weight"], params["conv2.bias"], stride=2)
        x = ops.avg_pool2d(jax.nn.relu(x), 3, 1)
        x = x.reshape(x.shape[0], -1)
        meta = jnp.concatenate([X[1] * 0.1, X[2]], axis=1)
        x = jnp.concatenate([x, meta], axis=1)
        x = ops.leaky_relu(ops.linear(x, params["fc0.weight"]))
        x = ops.leaky_relu(ops.linear(x, params["fc1.weight"]))
        x = jnp.tanh(ops.linear(x, params["fc2.weight"]))
        x = ops.linear(x, params["fc3.weight"], params["fc3.bias"])
        return x, None, updates


class LSTMNet:
    """Conv+LSTM+FC network, 2,949,937 params (vitfly_models.py:72-109)."""

    def init(self, key) -> Params:
        ks = jax.random.split(key, 6)
        p = prefix_params("conv1", init_conv2d(ks[0], 1, 4, 5))
        p.update(prefix_params("conv2", init_conv2d(ks[1], 4, 10, 3)))
        p.update(prefix_params("bn1", init_batchnorm2d(4)))
        p.update(prefix_params("bn2", init_batchnorm2d(10)))
        p.update(prefix_params("lstm", init_lstm(ks[2], 665, 395, 2, bias=False)))
        p.update(prefix_params("fc1", init_spectral_linear(ks[3], 395, 64)))
        p.update(prefix_params("fc2", init_spectral_linear(ks[4], 64, 16)))
        p.update(prefix_params("fc3", init_spectral_linear(ks[5], 16, 3)))
        return p

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        X = refine_inputs(X)
        updates: Params = {}
        x = ops.conv2d(X[0], params["conv1.weight"], params["conv1.bias"], stride=3, padding=1)
        x = _bn(params, "bn1", jax.nn.relu(x), train, updates, frame_mask)
        x = -ops.max_pool2d(-x, 3, 1)
        x = ops.conv2d(x, params["conv2.weight"], params["conv2.bias"], stride=2)
        x = _bn(params, "bn2", jax.nn.relu(x), train, updates, frame_mask)
        x = ops.avg_pool2d(x, 3, 1)
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, X[1] * 0.1, X[2]], axis=1)
        hidden = X[3] if len(X) > 3 else None
        x, h = lstm_apply(
            sub(params, "lstm"), x, hidden, num_layers=2, hidden_size=395,
            dropout_p=0.15, train=train, rng=rng,
        )
        x = ops.leaky_relu(_speclin(params, "fc1", x))
        x = ops.leaky_relu(_speclin(params, "fc2", x))
        x = _speclin(params, "fc3", x)
        return x, h, updates


class LSTMNetVIT:
    """ViT+LSTM — the paper's V(φ), 3,563,663 params (vitfly_models.py:111-150)."""

    def __init__(self):
        self.encoder_blocks = [
            MixTransformerEncoderLayer(1, 32, patch_size=7, stride=4, padding=3,
                                       n_layers=2, reduction_ratio=8, num_heads=1, expansion_factor=8),
            MixTransformerEncoderLayer(32, 64, patch_size=3, stride=2, padding=1,
                                       n_layers=2, reduction_ratio=4, num_heads=2, expansion_factor=8),
        ]

    def init(self, key) -> Params:
        ks = jax.random.split(key, 6)
        p = prefix_params("encoder_blocks.0", self.encoder_blocks[0].init(ks[0]))
        p.update(prefix_params("encoder_blocks.1", self.encoder_blocks[1].init(ks[1])))
        p.update(prefix_params("decoder", init_spectral_linear(ks[2], 4608, 512)))
        p.update(prefix_params("lstm", init_lstm(ks[3], 517, 128, 3, bias=True)))
        p.update(prefix_params("nn_fc2", init_spectral_linear(ks[4], 128, 3)))
        p.update(prefix_params("down_sample", init_conv2d(ks[5], 48, 12, 3)))
        return p

    def _encode(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        e1 = self.encoder_blocks[0].apply(sub(params, "encoder_blocks.0"), x)     # (B,32,15,23)
        e2 = self.encoder_blocks[1].apply(sub(params, "encoder_blocks.1"), e1)    # (B,64,8,12)
        fused = jnp.concatenate(
            [
                ops.pixel_shuffle(e2, 2),                                          # (B,16,16,24)
                ops.interpolate_bilinear(e1, (16, 24), align_corners=True),        # (B,32,16,24)
            ],
            axis=1,
        )
        fused = ops.conv2d(
            fused, params["down_sample.weight"], params["down_sample.bias"], padding=1
        )
        return _speclin(params, "decoder", fused.reshape(fused.shape[0], -1))

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        X = refine_inputs(X)
        out = self._encode(params, X[0])
        out = jnp.concatenate([out, X[1] / 10.0, X[2]], axis=1)
        hidden = X[3] if len(X) > 3 else None
        out, h = lstm_apply(
            sub(params, "lstm"), out, hidden, num_layers=3, hidden_size=128,
            dropout_p=0.1, train=train, rng=rng,
        )
        out = _speclin(params, "nn_fc2", out)
        return out, h, {}


class ViT:
    """ViT+FC network, 3,101,199 params (vitfly_models.py:152-186)."""

    def __init__(self):
        self.encoder_blocks = LSTMNetVIT().encoder_blocks

    def init(self, key) -> Params:
        ks = jax.random.split(key, 6)
        p = prefix_params("encoder_blocks.0", self.encoder_blocks[0].init(ks[0]))
        p.update(prefix_params("encoder_blocks.1", self.encoder_blocks[1].init(ks[1])))
        p.update(prefix_params("decoder", init_linear(ks[2], 4608, 512)))
        p.update(prefix_params("nn_fc1", init_spectral_linear(ks[3], 517, 256)))
        p.update(prefix_params("nn_fc2", init_spectral_linear(ks[4], 256, 3)))
        p.update(prefix_params("down_sample", init_conv2d(ks[5], 48, 12, 3)))
        return p

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        X = refine_inputs(X)
        e1 = self.encoder_blocks[0].apply(sub(params, "encoder_blocks.0"), X[0])
        e2 = self.encoder_blocks[1].apply(sub(params, "encoder_blocks.1"), e1)
        fused = jnp.concatenate(
            [ops.pixel_shuffle(e2, 2), ops.interpolate_bilinear(e1, (16, 24), align_corners=True)],
            axis=1,
        )
        fused = ops.conv2d(fused, params["down_sample.weight"], params["down_sample.bias"], padding=1)
        out = ops.linear(fused.reshape(fused.shape[0], -1), params["decoder.weight"], params["decoder.bias"])
        out = jnp.concatenate([out, X[1] / 10.0, X[2]], axis=1)
        out = ops.leaky_relu(_speclin(params, "nn_fc1", out))
        out = _speclin(params, "nn_fc2", out)
        return out, None, {}


class UNetConvLSTMNet:
    """UNet+ConvNet+LSTM network, 2,955,822 params (vitfly_models.py:188-263)."""

    def init(self, key) -> Params:
        ks = jax.random.split(key, 20)
        p: Params = {}
        convs = [
            ("unet_e11", 1, 4, 3), ("unet_e12", 4, 4, 3),
            ("unet_e21", 4, 8, 3), ("unet_e22", 8, 8, 3),
            ("unet_e31", 8, 16, 3), ("unet_e32", 16, 16, 3),
            ("unet_d11", 16, 8, 3), ("unet_d12", 8, 8, 3),
            ("unet_d21", 8, 4, 3), ("unet_d22", 4, 4, 3),
            ("unet_out", 4, 1, 1),
            ("conv_conv1", 2, 4, 5), ("conv_conv2", 4, 10, 5),
        ]
        for i, (name, ci, co, k) in enumerate(convs):
            p.update(prefix_params(name, init_conv2d(ks[i], ci, co, k)))
        p.update(prefix_params("unet_upconv1", init_conv_transpose2d(ks[13], 16, 8, 2)))
        p.update(prefix_params("unet_upconv2", init_conv_transpose2d(ks[14], 8, 4, 3)))
        p.update(prefix_params("conv_bn1", init_batchnorm2d(4)))
        p.update(prefix_params("lstm", init_lstm(ks[15], 3065, 200, 2, bias=False)))
        p.update(prefix_params("nn_fc1", init_spectral_linear(ks[16], 200, 64)))
        p.update(prefix_params("nn_fc2", init_spectral_linear(ks[17], 64, 32)))
        p.update(prefix_params("nn_fc3", init_spectral_linear(ks[18], 32, 3)))
        return p

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        X = refine_inputs(X)
        updates: Params = {}
        img, des_vel, quat = X[0], X[1], X[2]
        relu = jax.nn.relu

        def c(name, x, padding=1, stride=1):
            return ops.conv2d(x, params[f"{name}.weight"], params[f"{name}.bias"], stride=stride, padding=padding)

        y_e1 = relu(c("unet_e12", relu(c("unet_e11", img))))
        enc1 = ops.max_pool2d(y_e1, 2, 3)
        y_e2 = relu(c("unet_e22", relu(c("unet_e21", enc1))))
        enc2 = ops.max_pool2d(y_e2, 2, 2)
        y_e3 = relu(c("unet_e32", relu(c("unet_e31", enc2))))

        up1 = ops.conv_transpose2d(y_e3, params["unet_upconv1.weight"], params["unet_upconv1.bias"], stride=2)
        d1 = relu(c("unet_d12", relu(c("unet_d11", jnp.concatenate([up1, y_e2], axis=1)))))
        up2 = ops.conv_transpose2d(d1, params["unet_upconv2.weight"], params["unet_upconv2.bias"], stride=3)
        d2 = relu(c("unet_d22", relu(c("unet_d21", jnp.concatenate([up2, y_e1], axis=1)))))
        y_unet = c("unet_out", d2, padding=0)

        x_conv = jnp.concatenate([img, y_unet], axis=1)
        y = c("conv_conv1", x_conv, padding=0, stride=3)
        y = _bn(params, "conv_bn1", y, train, updates, frame_mask)
        y = -ops.max_pool2d(-relu(y), 2, 1)
        y = relu(c("conv_conv2", y, padding=0, stride=2))
        y = ops.avg_pool2d(y, 2, 1)

        x_lstm = jnp.concatenate(
            [y.reshape(y.shape[0], -1), y_e3.reshape(y_e3.shape[0], -1), des_vel * 0.1, quat],
            axis=1,
        )
        hidden = X[3] if len(X) > 3 else None
        y_lstm, h = lstm_apply(
            sub(params, "lstm"), x_lstm, hidden, num_layers=2, hidden_size=200,
            dropout_p=0.15, train=train, rng=rng,
        )
        y = ops.leaky_relu(_speclin(params, "nn_fc1", y_lstm))
        y = ops.leaky_relu(_speclin(params, "nn_fc2", y))
        y = _speclin(params, "nn_fc3", y)
        return y, h, updates
