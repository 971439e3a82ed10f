"""SegFormer-style MixTransformer blocks (efficient spatial-reduction attention).

Functional parity with the reference's ViT submodules
(ViTsubmodules.py:15-148, itself derived from github.com/git-dhruv/Segformer):
OverlapPatchMerging → [EfficientSelfAttention ⊕ MixFFN ⊕ LayerNorm]×n.

Attention here is within-frame spatial attention over ≤345 tokens with
spatial-reduction of K/V (reduction_ratio 8/4) — small enough that a single
fused XLA dot-product attention is optimal on TPU; no flash/ring machinery
is warranted (SURVEY.md §5.7).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import ops
from .common import Params, init_conv2d, init_layernorm, init_linear, prefix_params


class OverlapPatchMerging:
    def __init__(self, in_channels, out_channels, patch_size, stride, padding):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.patch_size = patch_size
        self.stride = stride
        self.padding = padding

    def init(self, key) -> Params:
        k1, _ = jax.random.split(key)
        p = prefix_params("cn1", init_conv2d(k1, self.in_channels, self.out_channels, self.patch_size))
        p.update(prefix_params("layerNorm", init_layernorm(self.out_channels)))
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        x = ops.conv2d(
            x, params["cn1.weight"], params["cn1.bias"], stride=self.stride, padding=self.padding
        )
        _, _, H, W = x.shape
        x = x.reshape(x.shape[0], x.shape[1], H * W).transpose(0, 2, 1)  # (B, N, C)
        x = ops.layer_norm(x, params["layerNorm.weight"], params["layerNorm.bias"])
        return x, H, W


class EfficientSelfAttention:
    def __init__(self, channels, reduction_ratio, num_heads):
        assert channels % num_heads == 0
        self.channels = channels
        self.reduction_ratio = reduction_ratio
        self.heads = num_heads

    def init(self, key) -> Params:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        c = self.channels
        p = prefix_params("cn1", init_conv2d(k1, c, c, self.reduction_ratio))
        p.update(prefix_params("ln1", init_layernorm(c)))
        p.update(prefix_params("keyValueExtractor", init_linear(k2, c, c * 2)))
        p.update(prefix_params("query", init_linear(k3, c, c)))
        p.update(prefix_params("finalLayer", init_linear(k4, c, c)))
        return p

    def apply(self, params: Params, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, N, C = x.shape
        heads, dh = self.heads, C // self.heads
        # spatial reduction of K/V tokens
        x1 = x.transpose(0, 2, 1).reshape(B, C, H, W)
        x1 = ops.conv2d(
            x1, params["cn1.weight"], params["cn1.bias"],
            stride=self.reduction_ratio, padding=0,
        )
        x1 = x1.reshape(B, C, -1).transpose(0, 2, 1)  # (B, N', C)
        x1 = ops.layer_norm(x1, params["ln1.weight"], params["ln1.bias"])
        kv = ops.linear(x1, params["keyValueExtractor.weight"], params["keyValueExtractor.bias"])
        n_red = kv.shape[1]
        kv = kv.reshape(B, n_red, 2, heads, dh).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]  # (B, heads, N', dh)
        q = ops.linear(x, params["query.weight"], params["query.bias"])
        q = q.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)  # (B, heads, N, dh)

        scale = math.sqrt(C / heads)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=ops.imageops.PRECISION) / scale, axis=-1
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=ops.imageops.PRECISION)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return ops.linear(out, params["finalLayer.weight"], params["finalLayer.bias"])


class MixFFN:
    def __init__(self, channels, expansion_factor):
        self.channels = channels
        self.expanded = channels * expansion_factor

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p = prefix_params("mlp1", init_linear(k1, self.channels, self.expanded))
        # depthwise-ish conv: groups = channels (NOT expanded) — ViTsubmodules.py:92
        p.update(
            prefix_params(
                "depthwise",
                init_conv2d(k2, self.expanded, self.expanded, 3, groups=self.channels),
            )
        )
        p.update(prefix_params("mlp2", init_linear(k3, self.expanded, self.channels)))
        return p

    def apply(self, params: Params, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        x = ops.linear(x, params["mlp1.weight"], params["mlp1.bias"])
        B, N, C = x.shape
        x = x.transpose(0, 2, 1).reshape(B, C, H, W)
        x = ops.conv2d(
            x, params["depthwise.weight"], params["depthwise.bias"],
            padding="same", groups=self.channels,
        )
        x = ops.gelu_exact(x.reshape(B, C, N).transpose(0, 2, 1))
        return ops.linear(x, params["mlp2.weight"], params["mlp2.bias"])


class MixTransformerEncoderLayer:
    def __init__(
        self, in_channels, out_channels, patch_size, stride, padding,
        n_layers, reduction_ratio, num_heads, expansion_factor,
    ):
        self.patchMerge = OverlapPatchMerging(in_channels, out_channels, patch_size, stride, padding)
        self.n_layers = n_layers
        self.out_channels = out_channels
        self._attn = [EfficientSelfAttention(out_channels, reduction_ratio, num_heads) for _ in range(n_layers)]
        self._ffn = [MixFFN(out_channels, expansion_factor) for _ in range(n_layers)]

    def init(self, key) -> Params:
        keys = jax.random.split(key, 1 + 2 * self.n_layers)
        p = prefix_params("patchMerge", self.patchMerge.init(keys[0]))
        for i in range(self.n_layers):
            p.update(prefix_params(f"_attn.{i}", self._attn[i].init(keys[1 + 2 * i])))
            p.update(prefix_params(f"_ffn.{i}", self._ffn[i].init(keys[2 + 2 * i])))
            p.update(prefix_params(f"_lNorm.{i}", init_layernorm(self.out_channels)))
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        from .common import sub

        B = x.shape[0]
        x, H, W = self.patchMerge.apply(sub(params, "patchMerge"), x)
        for i in range(self.n_layers):
            x = x + self._attn[i].apply(sub(params, f"_attn.{i}"), x, H, W)
            x = x + self._ffn[i].apply(sub(params, f"_ffn.{i}"), x, H, W)
            x = ops.layer_norm(x, params[f"_lNorm.{i}.weight"], params[f"_lNorm.{i}.bias"])
        return x.reshape(B, H, W, -1).transpose(0, 3, 1, 2)
