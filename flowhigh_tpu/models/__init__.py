from .transformer import Transformer, ConvPositionEmbed, LearnedSinusoidalPosEmb
from .convnext import ConvNeXtBackbone, ConvNeXtBlock
from .vector_field import VectorFieldNet, forward_with_cond_scale
from .bigvgan import BigVGAN, Activation1d, AMPBlock1, AMPBlock2
from .melvoco import MelVoco, encode as mel_encode

__all__ = [
    "Transformer", "ConvPositionEmbed", "LearnedSinusoidalPosEmb",
    "ConvNeXtBackbone", "ConvNeXtBlock",
    "VectorFieldNet", "forward_with_cond_scale",
    "BigVGAN", "Activation1d", "AMPBlock1", "AMPBlock2",
    "MelVoco", "mel_encode",
]
