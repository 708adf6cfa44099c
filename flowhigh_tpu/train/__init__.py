from .optimizer import make_optimizer, lr_schedule
from .data import (AudioDataset, SyntheticAudioDataset, VocoderSegmentDataset,
                   batch_iterator, random_split, scan_checkpoints, Subset)
from .trainer import Trainer, TrainState

__all__ = [
    "make_optimizer", "lr_schedule",
    "AudioDataset", "SyntheticAudioDataset", "VocoderSegmentDataset",
    "batch_iterator", "random_split", "scan_checkpoints", "Subset",
    "Trainer", "TrainState",
]

from .vocoder_trainer import VocoderTrainer, VocoderTrainState  # noqa: E402

__all__ += ["VocoderTrainer", "VocoderTrainState"]
