"""OrigUNet — the events→depth D(θ) backbone, TPU-functional.

Reproduces the reference OrigUNet (learner_models.py:339-616) exactly:

* 5-level valid-padding (padding=0) UNet on 260×346 inputs, channels 32→512,
  bottleneck ``middle_shape`` (1,512,8,13), decoder output (1,1,68,148)
  bilinearly upsampled (align_corners=False) back to the input size.
* Skip connections by center-crop or bilinear-interp or none, with the
  reference's hardcoded per-level (big, small) sizes (learner_models.py:558-580).
* Optional 1-layer ConvLSTM with 1×1 kernels at the bottleneck, applied as a
  length-N sequence with batch 1 (learner_models.py:544-546) — here a
  lax.scan with explicit (h, c) carry.
* Optional velocity-prediction heads velpred ∈ {1, 11, 2} tapping the interp
  output / pre-upsample decoder output / bottleneck, each DynamicConvNet →
  optional LSTM → VelPredictor (learner_models.py:428-472,594-614).
* Event-frame input forming: evs_min_cutoff zeroing then 2-channel neg/pos
  (BEV 0), |x| (BEV 1), or binary mask (BEV 2) (learner_models.py:476-494).

Param keys mirror the torch state_dict (``unet_e11.weight`` …) so pretrained
D(θ) checkpoints port as a cast.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import ops
from .common import Params, init_conv2d, init_conv_transpose2d, init_lstm, prefix_params
from .layers import DynamicConvNet, VelPredictor
from .recurrent import convlstm_apply, convlstm_init_hidden, init_convlstm, lstm_apply

def _unet_sizes(H: int, W: int):
    """Valid-conv arithmetic for the 5-level UNet -> (skip sizes, middle, decoded).

    The reference hardcodes these for 260×346 (learner_models.py:558-580:
    bigs (25,35),(58,79),(124,167),(256,342); smalls (16,26),(24,44),(40,80),
    (72,152); middle (8,13); decoded (68,148)).  We derive them from the
    input size with the same arithmetic so the model also works at other
    resolutions (e.g. tiny shapes for multi-chip dry runs); at 260×346 the
    derived values equal the reference's constants (asserted in tests).
    """
    def enc(h):
        sizes = []
        for _ in range(4):
            h = h - 4          # two valid 3x3 convs
            sizes.append(h)
            h = h // 2         # maxpool 2/2 floor
        h = h - 4              # e51/e52
        sizes.append(h)
        return sizes

    eh, ew = enc(H), enc(W)
    bigs = list(zip(eh[:4][::-1], ew[:4][::-1]))  # y_e4, y_e3, y_e2, y_e1
    middle = (eh[4], ew[4])
    smalls = []
    h, w = middle
    for lvl in range(4):
        h, w = h * 2, w * 2    # upconv k2 s2
        smalls.append((h, w))
        h, w = h - 4, w - 4    # two valid 3x3 convs
    decoded = (h, w)
    skip_sizes = [(bigs[i], smalls[i]) for i in range(4)]
    return skip_sizes, middle, decoded


class OrigUNet:
    def __init__(
        self,
        num_in_channels: int = 2,
        num_out_channels: int = 1,
        num_recurrent=(0, 0),
        enc_params: Optional[dict] = None,
        fc_params: Optional[dict] = None,
        input_shape=(1, 2, 260, 346),
        velpred: int = 0,
        form_BEV: int = 0,
        is_deployment: bool = False,
        evs_min_cutoff: float = 1e-3,
        skip_type: str = "crop",
    ):
        self.num_in_channels = num_in_channels
        self.num_out_channels = num_out_channels
        self.num_recurrent = list(num_recurrent) if not isinstance(num_recurrent, int) else [num_recurrent, 0]
        self.input_shape = input_shape
        self.input_h, self.input_w = input_shape[-2], input_shape[-1]
        self.velpred = velpred
        self.form_BEV = form_BEV
        self.is_deployment = is_deployment
        self.evs_min_cutoff = evs_min_cutoff
        self.skip_type = skip_type
        self.enc_params = enc_params
        self.fc_params = fc_params

        if self.form_BEV in (1, 2):
            self.num_in_channels = 1
        elif self.form_BEV != 0:
            raise ValueError(f"form_BEV should be 0/1/2, but is {self.form_BEV}")

        self.decoder_numch_scalar = 1 if self.skip_type == "none" else 2
        self.skip_sizes, middle_hw, decoded_hw = _unet_sizes(self.input_h, self.input_w)
        self.middle_shape = (1, 512, middle_hw[0], middle_hw[1])
        self.decoded_shape = (1, 1, decoded_hw[0], decoded_hw[1])

        # velocity-prediction head
        self.convnet_velpred: Optional[DynamicConvNet] = None
        self.velpred_head: Optional[VelPredictor] = None
        self.velpred_lstm_size = 0
        if self.velpred > 0:
            ep = enc_params
            if self.velpred == 1:
                in_ch, in_hw = 1, (input_shape[-2], input_shape[-1])
            elif self.velpred == 11:
                in_ch, in_hw = self.decoded_shape[1], (self.decoded_shape[2], self.decoded_shape[3])
            elif self.velpred == 2:
                in_ch, in_hw = self.middle_shape[1], (self.middle_shape[2], self.middle_shape[3])
            else:
                raise ValueError(f"velpred {self.velpred}")
            self.convnet_velpred = DynamicConvNet(
                in_channels=in_ch,
                num_layers=ep["num_layers"],
                kernel_sizes=ep["kernel_sizes"],
                kernel_strides=ep["kernel_strides"],
                out_channels=ep["out_channels"],
                activations=ep["activations"],
                pool_type=ep["pool_type"],
                pool_kernels=ep["pool_kernels"],
                pool_strides=ep["pool_strides"],
                conv_function=ep["conv_function"],
                invert_pool_input=ep.get("invert_pool_inputs", False),
            )
            c, h, w = self.convnet_velpred.output_shape(in_hw)
            self.convnet_velpred_outsize = (1, c, h, w)
            self.velpred_lstm_size = c * h * w
            self.velpred_head = VelPredictor(
                fc_params=fc_params, input_size=self.velpred_lstm_size, num_out=1
            )

    # ----------------------------------------------------------------- init

    def init(self, key) -> Params:
        p: Params = {}
        chans = [
            ("unet_e11", self.num_in_channels, 32, 3),
            ("unet_e12", 32, 32, 3),
            ("unet_e21", 32, 64, 3),
            ("unet_e22", 64, 64, 3),
            ("unet_e31", 64, 128, 3),
            ("unet_e32", 128, 128, 3),
            ("unet_e41", 128, 256, 3),
            ("unet_e42", 256, 256, 3),
            ("unet_e51", 256, 512, 3),
            ("unet_e52", 512, 512, 3),
            ("unet_d11", self.decoder_numch_scalar * 256, 256, 3),
            ("unet_d12", 256, 256, 3),
            ("unet_d21", self.decoder_numch_scalar * 128, 128, 3),
            ("unet_d22", 128, 128, 3),
            ("unet_d31", self.decoder_numch_scalar * 64, 64, 3),
            ("unet_d32", 64, 64, 3),
            ("unet_d41", self.decoder_numch_scalar * 32, 32, 3),
            ("unet_d42", 32, 32, 3),
            ("unet_out", 32, self.num_out_channels, 1),
        ]
        upconvs = [
            ("unet_upconv1", 512, 256),
            ("unet_upconv2", 256, 128),
            ("unet_upconv3", 128, 64),
            ("unet_upconv4", 64, 32),
        ]
        keys = jax.random.split(key, len(chans) + len(upconvs) + 4)
        ki = 0
        for name, cin, cout, k in chans:
            p.update(prefix_params(name, init_conv2d(keys[ki], cin, cout, k)))
            ki += 1
        for name, cin, cout in upconvs:
            p.update(prefix_params(name, init_conv_transpose2d(keys[ki], cin, cout, 2)))
            ki += 1
        if self.num_recurrent[0] > 0:
            p.update(
                prefix_params(
                    "lstm",
                    init_convlstm(
                        keys[ki], 512, [512] * self.num_recurrent[0], (1, 1), bias=False
                    ),
                )
            )
        ki += 1
        if self.velpred > 0:
            p.update(prefix_params("convnet_velpred", self.convnet_velpred.init(keys[ki])))
            ki += 1
            if self.num_recurrent[1] > 0:
                p.update(
                    prefix_params(
                        "lstm_velpred",
                        init_lstm(
                            keys[ki], self.velpred_lstm_size, self.velpred_lstm_size,
                            self.num_recurrent[1],
                        ),
                    )
                )
            ki += 1
            p.update(prefix_params("velpred_head", self.velpred_head.init(keys[ki])))
        return p

    # ------------------------------------------------------------- helpers

    def form_input(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.where(jnp.abs(x) < self.evs_min_cutoff, 0.0, x)
        if self.form_BEV == 0:
            neg = jnp.where(x < 0, jnp.abs(x), 0.0)
            pos = jnp.where(x > 0, x, 0.0)
            return jnp.concatenate([neg, pos], axis=1)
        if self.form_BEV == 1:
            return jnp.abs(x)
        if self.form_BEV == 2:
            return jnp.where(x != 0.0, 1.0, 0.0)
        raise ValueError(self.form_BEV)

    def form_output(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        upsampled = ops.interpolate_bilinear(x, (self.input_h, self.input_w), align_corners=False)
        upconv = x
        if self.num_out_channels == 2:
            upsampled = (upsampled[:, 1] - upsampled[:, 0])[:, None]
            upconv = (x[:, 1] - x[:, 0])[:, None]
        return upsampled, upconv

    def skip(self, y: jnp.ndarray, big, small):
        if self.skip_type == "crop":
            h0 = big[0] // 2 - small[0] // 2
            w0 = big[1] // 2 - small[1] // 2
            return y[:, :, h0 : big[0] // 2 + small[0] // 2, w0 : big[1] // 2 + small[1] // 2]
        if self.skip_type == "interp":
            return ops.interpolate_bilinear(y, small, align_corners=False)
        if self.skip_type == "none":
            return None
        raise ValueError(self.skip_type)

    def init_hidden(self, dtype=jnp.float32):
        """Zero hidden state pytree (h_unet, h_velpred) for streaming."""
        h_unet = (
            convlstm_init_hidden(
                1, [512] * self.num_recurrent[0],
                self.middle_shape[2], self.middle_shape[3], dtype,
            )
            if self.num_recurrent[0] > 0
            else None
        )
        h_velpred = None
        if self.velpred > 0 and self.num_recurrent[1] > 0:
            h_velpred = (
                jnp.zeros((self.num_recurrent[1], self.velpred_lstm_size), dtype),
                jnp.zeros((self.num_recurrent[1], self.velpred_lstm_size), dtype),
            )
        return (h_unet, h_velpred)

    # -------------------------------------------------------------- apply

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        """X = [evframe (N,1,H,W), desvel (N,1), hidden (h_unet, h_velpred)].

        Returns (y_vel, (y_interp, y_upconv, (h_unet, h_velpred)), updates).
        ``frame_mask`` (N,) excludes padded frames from velpred-head BN stats.
        """
        im = X[0]
        if self.num_in_channels == 2 or self.form_BEV > 0:
            im = self.form_input(im)
        hidden = X[2] if len(X) > 2 and X[2] is not None else (None, None)
        updates: Params = {}

        def conv(name, x, k=3):
            return ops.conv2d(x, params[f"{name}.weight"], params[f"{name}.bias"], padding=0)

        def upconv(name, x):
            return ops.conv_transpose2d(
                x, params[f"{name}.weight"], params[f"{name}.bias"], stride=2
            )

        relu = jax.nn.relu

        # encoder
        y_e1 = relu(conv("unet_e12", relu(conv("unet_e11", im))))
        enc1 = ops.max_pool2d(y_e1, 2, 2)
        y_e2 = relu(conv("unet_e22", relu(conv("unet_e21", enc1))))
        enc2 = ops.max_pool2d(y_e2, 2, 2)
        y_e3 = relu(conv("unet_e32", relu(conv("unet_e31", enc2))))
        enc3 = ops.max_pool2d(y_e3, 2, 2)
        y_e4 = relu(conv("unet_e42", relu(conv("unet_e41", enc3))))
        enc4 = ops.max_pool2d(y_e4, 2, 2)
        y_e5 = relu(conv("unet_e52", relu(conv("unet_e51", enc4))))

        h_unet = None
        if self.num_recurrent[0] > 0:
            # batch dim is the time axis: (N,512,8,13) -> (1,N,512,8,13)
            seq = y_e5[None]
            lstm_params = {k[len("lstm."):]: v for k, v in params.items() if k.startswith("lstm.") and not k.startswith("lstm_velpred.")}
            outs, h_unet = convlstm_apply(
                lstm_params, seq, hidden[0], [512] * self.num_recurrent[0], (1, 1)
            )
            y_e5 = outs[0]

        y_upconv = None
        y_interp = None

        if not self.is_deployment or (self.is_deployment and self.velpred in (1, 11)):
            sk = self.skip(y_e4, *self.skip_sizes[0])
            up = upconv("unet_upconv1", y_e5)
            cat = jnp.concatenate([sk, up], axis=1) if sk is not None else up
            y_d1 = relu(conv("unet_d12", relu(conv("unet_d11", cat))))

            sk = self.skip(y_e3, *self.skip_sizes[1])
            up = upconv("unet_upconv2", y_d1)
            cat = jnp.concatenate([sk, up], axis=1) if sk is not None else up
            y_d2 = relu(conv("unet_d22", relu(conv("unet_d21", cat))))

            sk = self.skip(y_e2, *self.skip_sizes[2])
            up = upconv("unet_upconv3", y_d2)
            cat = jnp.concatenate([sk, up], axis=1) if sk is not None else up
            y_d3 = relu(conv("unet_d32", relu(conv("unet_d31", cat))))

            sk = self.skip(y_e1, *self.skip_sizes[3])
            up = upconv("unet_upconv4", y_d3)
            cat = jnp.concatenate([sk, up], axis=1) if sk is not None else up
            y_d4 = relu(conv("unet_d42", relu(conv("unet_d41", cat))))

            y_out = ops.conv2d(y_d4, params["unet_out.weight"], params["unet_out.bias"])
            y_interp, y_upconv = self.form_output(y_out)

        # velocity prediction
        n = X[0].shape[0]
        y_vel = jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
        h_velpred = None
        if self.velpred > 0:
            tap = {1: y_interp, 11: y_upconv, 2: y_e5}[self.velpred]
            feats, cv_updates = self.convnet_velpred.apply(
                {k[len("convnet_velpred."):]: v for k, v in params.items() if k.startswith("convnet_velpred.")},
                tap,
                train,
                frame_mask=frame_mask,
            )
            updates.update({f"convnet_velpred.{k}": v for k, v in cv_updates.items()})
            feats = feats.reshape(feats.shape[0], -1)
            if self.num_recurrent[1] > 0:
                lstm_p = {k[len("lstm_velpred."):]: v for k, v in params.items() if k.startswith("lstm_velpred.")}
                feats, h_velpred = lstm_apply(
                    lstm_p,
                    feats,
                    hidden[1],
                    self.num_recurrent[1],
                    self.velpred_lstm_size,
                    dropout_p=0.1,
                    train=train,
                    rng=rng,
                )
            y_vel, _ = self.velpred_head.apply(
                {k[len("velpred_head."):]: v for k, v in params.items() if k.startswith("velpred_head.")},
                [feats],
                train,
                rng,
            )

        return y_vel, (y_interp, y_upconv, (h_unet, h_velpred)), updates
