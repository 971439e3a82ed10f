"""Legacy competition-era ViT (`envtest/ros/network.py` parity).

The reference ships a standalone encoder-only ViT — PatchEmbed → cls token
+ learned positional embedding → N pre-residual TransformerBlocks → LayerNorm
→ 3-vector head on the cls token (network.py:149-210).  It is DEAD CODE in
the reference (imported nowhere on a live path) but is part of the §2
component inventory, so it is rebuilt here for drop-in completeness: params
are a flat dict keyed exactly like the torch ``state_dict()``, so a legacy
checkpoint loads through ``models.port``.

Faithfully replicated quirks (do not "fix" — they are the parity contract):

* attention scales by ``embed_size ** 0.5``, NOT ``head_dim ** 0.5``
  (network.py:66,118) — the softmax temperature differs from standard MHA
  by a factor of sqrt(heads);
* ``CrossAttention`` applies the mask AFTER the softmax (network.py:66-69),
  so masked positions get -1e20 *probability* — with the encoder's
  ``mask=None`` call path this never fires, but the behavior is preserved;
* the block wiring ``layer(out, out, out, mask)`` routes arg1→queries,
  arg2→keys, arg3→values AND the residual adds arg3 (network.py:55-63,148-152);
  indistinguishable under self-attention but preserved structurally;
* the forward returns ``out[0]`` — the FIRST batch element only, shape (3,)
  (network.py:210).

Inference-mode parity: the reference's Dropout layers are identity in
``eval()`` and this rebuild targets the (dead) deployment path, so dropout
is omitted.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .. import ops
from .common import Params, init_conv2d, init_layernorm, init_linear, prefix_params


class LegacyTransformer:
    """network.py:157-210 ``Transformer`` (encoder-only ViT, 3-vector head)."""

    def __init__(
        self,
        img_size=(60, 90),
        patch_size=6,
        in_chans=1,
        embed_size=96,
        num_layers=3,
        heads=4,
        forward_expansion=4,
        dropout=0.0,
    ):
        assert embed_size % heads == 0, "Embed size needs to be div by heads"
        self.img_size = tuple(img_size)
        self.patch_size = patch_size
        self.in_chans = in_chans
        self.embed_size = embed_size
        self.num_layers = num_layers
        self.heads = heads
        self.forward_expansion = forward_expansion
        self.n_patches = (img_size[0] // patch_size) * (img_size[1] // patch_size)

    # ------------------------------------------------------------ params

    def init(self, key) -> Params:
        E, F = self.embed_size, self.forward_expansion
        keys = jax.random.split(key, 8 * self.num_layers + 4)
        p: Params = {}
        p.update(
            prefix_params(
                "patch_embed.proj",
                init_conv2d(keys[0], self.in_chans, E, self.patch_size),
            )
        )
        # zeros like torch (network.py:180-182)
        p["cls_token"] = jnp.zeros((1, 1, E), jnp.float32)
        p["pos_embed"] = jnp.zeros((1, 1 + self.n_patches, E), jnp.float32)
        p.update(prefix_params("norm", init_layernorm(E)))
        for i in range(self.num_layers):
            k = keys[4 + 8 * i : 4 + 8 * (i + 1)]
            pre = f"layers.{i}"
            p.update(prefix_params(f"{pre}.attention.values", init_linear(k[0], E, E, bias=False)))
            p.update(prefix_params(f"{pre}.attention.keys", init_linear(k[1], E, E, bias=False)))
            p.update(prefix_params(f"{pre}.attention.queries", init_linear(k[2], E, E, bias=False)))
            p.update(prefix_params(f"{pre}.attention.fc_out", init_linear(k[3], E, E)))
            p.update(prefix_params(f"{pre}.norm1", init_layernorm(E)))
            p.update(prefix_params(f"{pre}.norm2", init_layernorm(E)))
            p.update(prefix_params(f"{pre}.feed_forward.0", init_linear(k[4], E, F * E)))
            p.update(prefix_params(f"{pre}.feed_forward.2", init_linear(k[5], F * E, E)))
        p.update(prefix_params("fc_out", init_linear(keys[1], E, 3)))
        return p

    # ----------------------------------------------------------- forward

    def _attention(self, p: Params, pre: str, value, key, query, mask):
        """network.py:39-74 ``CrossAttention``: arg1→queries, arg2→keys,
        arg3→values; scale by sqrt(embed_size); mask after softmax."""
        N, qlen, E = value.shape
        klen = key.shape[1]
        h, dh = self.heads, E // self.heads
        values = ops.linear(query, p[f"{pre}.values.weight"]).reshape(N, klen, h, dh)
        keys = ops.linear(key, p[f"{pre}.keys.weight"]).reshape(N, klen, h, dh)
        queries = ops.linear(value, p[f"{pre}.queries.weight"]).reshape(N, qlen, h, dh)
        energy = jnp.einsum(
            "nqhd,nkhd->nhqk", queries, keys, precision=ops.imageops.PRECISION
        )
        attention = jax.nn.softmax(energy / math.sqrt(E), axis=3)
        if mask is not None:  # post-softmax masking — reference bug, kept
            attention = jnp.where(mask == 0, -1e20, attention)
        out = jnp.einsum(
            "nhql,nlhd->nqhd", attention, values, precision=ops.imageops.PRECISION
        ).reshape(N, qlen, h * dh)
        return ops.linear(out, p[f"{pre}.fc_out.weight"], p[f"{pre}.fc_out.bias"])

    def _block(self, p: Params, i: int, value, key, query, mask):
        pre = f"layers.{i}"
        attention = self._attention(p, f"{pre}.attention", value, key, query, mask)
        x = ops.layer_norm(
            attention + query, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"]
        )
        ff = ops.linear(x, p[f"{pre}.feed_forward.0.weight"], p[f"{pre}.feed_forward.0.bias"])
        ff = jax.nn.relu(ff)
        ff = ops.linear(ff, p[f"{pre}.feed_forward.2.weight"], p[f"{pre}.feed_forward.2.bias"])
        return ops.layer_norm(ff + x, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"])

    def apply(self, params: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        """x: (N, C, H, W) → (3,) — the reference returns batch element 0."""
        N = x.shape[0]
        E = self.embed_size
        # PatchEmbed: conv stride=patch → (N, n_patches, E)
        x = ops.conv2d(
            x, params["patch_embed.proj.weight"], params["patch_embed.proj.bias"],
            stride=self.patch_size, padding=0,
        )
        x = x.reshape(N, E, -1).transpose(0, 2, 1)
        cls = jnp.broadcast_to(params["cls_token"], (N, 1, E))
        out = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
        for i in range(self.num_layers):
            out = self._block(params, i, out, out, out, mask)
        out = ops.layer_norm(out, params["norm.weight"], params["norm.bias"])
        out = ops.linear(out[:, 0], params["fc_out.weight"], params["fc_out.bias"])
        return out[0]
