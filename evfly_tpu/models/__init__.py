from . import common, composites, layers, legacy_vit, origunet, port, recurrent, registry, vit, vitfly
from .common import Params, param_count, torch_param_count
from .composites import OrigUNet_w_ConvNet_w_VelPred, OrigUNet_w_VITFLY_ViTLSTM
from .origunet import OrigUNet
from .registry import build_model
from .vitfly import ConvNet, LSTMNet, LSTMNetVIT, UNetConvLSTMNet, ViT
from .legacy_vit import LegacyTransformer

__all__ = [
    "common", "composites", "layers", "legacy_vit", "origunet", "port", "recurrent",
    "registry", "vit", "vitfly",
    "Params", "param_count", "torch_param_count",
    "OrigUNet", "OrigUNet_w_VITFLY_ViTLSTM", "OrigUNet_w_ConvNet_w_VelPred",
    "ConvNet", "LSTMNet", "LSTMNetVIT", "UNetConvLSTMNet", "ViT",
    "build_model",
]
