"""Composite two-stage models: D(θ) events→depth + V(φ) depth→velocity.

OrigUNet_w_VITFLY_ViTLSTM parity (learner_models.py:618-636): the UNet's
interpolated depth is scaled ``clip(depth*2, 0, 1)`` before feeding the
ViTLSTM (the *2 matches the depth scale V(φ) was trained on,
learner_models.py:634).  Hidden-state convention:
``((h_unet, h_velpred), h_vitlstm)`` (learner_models.py:629-636).

The reference also declares OrigUNet_w_ConvNet_w_VelPred
(learner_models.py:638-658), but its second stage ``ConvNet_w_VelPred`` is
referenced and never defined anywhere in the repo — instantiating it
NameErrors (SURVEY.md §2.1 "bug, do not replicate blindly").  We therefore
provide a *working* equivalent second stage built from the same primitives
the name implies (DynamicConvNet encoder + optional LSTM + VelPredictor),
documented as a divergence from the reference's dead code path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .common import Params, init_lstm, prefix_params, sub
from .layers import DynamicConvNet, VelPredictor
from .origunet import OrigUNet
from .recurrent import lstm_apply
from .vitfly import LSTMNetVIT


class OrigUNet_w_VITFLY_ViTLSTM:
    def __init__(self, **origunet_kwargs):
        self.origunet = OrigUNet(**origunet_kwargs)
        self.vitfly_vitlstm = LSTMNetVIT()

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        p = prefix_params("origunet", self.origunet.init(k1))
        p.update(prefix_params("vitfly_vitlstm", self.vitfly_vitlstm.init(k2)))
        return p

    def init_hidden(self, dtype=jnp.float32):
        h_unet = self.origunet.init_hidden(dtype)
        h_vit = (jnp.zeros((3, 128), dtype), jnp.zeros((3, 128), dtype))
        return (h_unet, h_vit)

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        """X = [evframe, desvel, (h_unet, h_velpred), h_vitlstm].

        Returns (x_vel, (x_depth, y_upconv, ((h_unet, h_velpred), h_vitlstm)), updates).
        """
        x = X[0]
        _, (x_depth, y_upconv, (h_unet, h_velpred)), updates = self.origunet.apply(
            sub(params, "origunet"), [x, None, X[2]], train=train, rng=rng,
            frame_mask=frame_mask,
        )
        updates = prefix_params("origunet", updates)
        x_depth_input = jnp.clip(x_depth * 2.0, 0.0, 1.0)
        x_vel, h_vitlstm, vit_updates = self.vitfly_vitlstm.apply(
            sub(params, "vitfly_vitlstm"),
            [x_depth_input, X[1], None, X[3] if len(X) > 3 else None],
            train=train,
            rng=rng,
            frame_mask=frame_mask,
        )
        updates.update(prefix_params("vitfly_vitlstm", vit_updates))
        return x_vel, (x_depth, y_upconv, ((h_unet, h_velpred), h_vitlstm)), updates


class ConvNet_w_VelPred:
    """Working stand-in for the reference's undefined ConvNet_w_VelPred.

    DynamicConvNet encoder → optional LSTM → VelPredictor, consuming the
    OrigUNet's pre-upsample depth output (1, 1, 68, 148).  Param keys:
    ``convnet.*``, ``lstm.*``, ``velpred_head.*``.
    """

    def __init__(
        self,
        num_in_channels: int = 1,
        num_recurrent: int = 0,
        num_outputs: int = 1,
        enc_params: Optional[dict] = None,
        fc_params: Optional[dict] = None,
        input_shape=(1, 1, 68, 148),
    ):
        ep = enc_params
        self.num_recurrent = num_recurrent
        self.convnet = DynamicConvNet(
            in_channels=num_in_channels,
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
        c, h, w = self.convnet.output_shape((input_shape[-2], input_shape[-1]))
        self.feat_size = c * h * w
        self.velpred_head = VelPredictor(
            fc_params=fc_params, input_size=self.feat_size, num_out=num_outputs
        )

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p = prefix_params("convnet", self.convnet.init(k1))
        if self.num_recurrent > 0:
            p.update(prefix_params("lstm", init_lstm(k2, self.feat_size, self.feat_size, self.num_recurrent)))
        p.update(prefix_params("velpred_head", self.velpred_head.init(k3)))
        return p

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        x, updates = self.convnet.apply(sub(params, "convnet"), X[0], train, frame_mask=frame_mask)
        updates = prefix_params("convnet", updates)
        x = x.reshape(x.shape[0], -1)
        h = None
        if self.num_recurrent > 0:
            x, h = lstm_apply(
                sub(params, "lstm"), x, X[2] if len(X) > 2 else None,
                self.num_recurrent, self.feat_size, dropout_p=0.1, train=train, rng=rng,
            )
        vel, _ = self.velpred_head.apply(sub(params, "velpred_head"), [x], train, rng)
        return vel, h, updates


class OrigUNet_w_ConvNet_w_VelPred:
    """Two-stage D(θ) + ConvNet velocity head (learner_models.py:638-658)."""

    def __init__(self, num_outputs: int = 1, **origunet_kwargs):
        self.origunet = OrigUNet(**origunet_kwargs)
        nr = self.origunet.num_recurrent
        self.convnet_w_velpred = ConvNet_w_VelPred(
            num_in_channels=1,
            num_recurrent=nr[1] if len(nr) > 1 else 0,
            num_outputs=num_outputs,
            enc_params=origunet_kwargs.get("enc_params"),
            fc_params=origunet_kwargs.get("fc_params"),
            input_shape=(1, 1, 68, 148),
        )

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        p = prefix_params("origunet", self.origunet.init(k1))
        p.update(prefix_params("convnet_w_velpred", self.convnet_w_velpred.init(k2)))
        return p

    def init_hidden(self, dtype=jnp.float32):
        h_unet = self.origunet.init_hidden(dtype)
        h_cv = None
        if self.convnet_w_velpred.num_recurrent > 0:
            n = self.convnet_w_velpred.num_recurrent
            f = self.convnet_w_velpred.feat_size
            h_cv = (jnp.zeros((n, f), dtype), jnp.zeros((n, f), dtype))
        return (h_unet, h_cv)

    def apply(self, params: Params, X, train: bool = False, rng=None, frame_mask=None):
        x = X[0]
        _, (x_depth, y_upconv, (h_unet, h_velpred)), updates = self.origunet.apply(
            sub(params, "origunet"), [x, None, X[2]], train=train, rng=rng,
            frame_mask=frame_mask,
        )
        updates = prefix_params("origunet", updates)
        x_vel, h_cv, cv_updates = self.convnet_w_velpred.apply(
            sub(params, "convnet_w_velpred"),
            [y_upconv, None, X[3] if len(X) > 3 else None],
            train=train,
            rng=rng,
            frame_mask=frame_mask,
        )
        updates.update(prefix_params("convnet_w_velpred", cv_updates))
        return x_vel, (x_depth, y_upconv, ((h_unet, None), h_cv)), updates
