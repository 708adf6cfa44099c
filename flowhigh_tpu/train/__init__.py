from .optimizer import make_optimizer, lr_schedule
from .data import AudioDataset, SyntheticAudioDataset, batch_iterator
from .trainer import Trainer, TrainState

__all__ = [
    "make_optimizer", "lr_schedule",
    "AudioDataset", "SyntheticAudioDataset", "batch_iterator",
    "Trainer", "TrainState",
]

from .vocoder_trainer import VocoderTrainer, VocoderTrainState  # noqa: E402

__all__ += ["VocoderTrainer", "VocoderTrainState"]
