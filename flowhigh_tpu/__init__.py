"""flowhigh_tpu — TPU-native audio super-resolution via conditional flow matching.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
resemble-ai/flowhigh: any-rate -> 48 kHz speech/audio super-resolution over
256-band mels (voicebox-style transformer vector field, four CFM probability
paths, euler/midpoint single-step ODE sampling) vocoded by a BigVGAN 48 kHz
generator, with the reference's public API and PyTorch checkpoint format
preserved. (Reference API surface: src/flowhigh/__init__.py:1,
src/flowhigh/flowhighsr.py:21-149.)
"""

from .config import (
    CFMConfig,
    DataConfig,
    FlowHighConfig,
    MelConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)
from .sr import FlowHighSR
from .cfm_wrapper import ConditionalFlowMatcherWrapper, FLowHigh, init_bigvgan
from .serving import ServingPipeline
from .streaming import StreamingSR

__version__ = "0.3.0"

__all__ = [
    "FlowHighSR", "ConditionalFlowMatcherWrapper", "FLowHigh", "init_bigvgan",
    "StreamingSR", "ServingPipeline",
    "FlowHighConfig", "MelConfig", "VocoderConfig", "ModelConfig",
    "CFMConfig", "DataConfig", "TrainConfig",
]
