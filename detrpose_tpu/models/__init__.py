from .hgnetv2 import HGNetv2
from .hybrid_encoder import HybridEncoder
from .transformer import Transformer
from .decoder import TransformerDecoder, DeformableDecoderLayer, MSDeformAttn, LQE
from .detrpose import DETRPose
from .resnet import ResNet
from .postprocess import postprocess

__all__ = [
    "HGNetv2",
    "HybridEncoder",
    "Transformer",
    "TransformerDecoder",
    "DeformableDecoderLayer",
    "MSDeformAttn",
    "LQE",
    "DETRPose",
    "ResNet",
    "postprocess",
]
