from .stft import stft, istft, stft_magnitude, hann_window, frame_signal, num_frames
from .mel import mel_filterbank, apply_mel, log_compress, hz_to_mel, mel_to_hz
from .resample import resample_poly, upsample_to_48k, output_length
from .filters import cheby1_sos, host_degrade, sosfiltfilt

__all__ = [
    "stft", "istft", "stft_magnitude", "hann_window", "frame_signal", "num_frames",
    "mel_filterbank", "apply_mel", "log_compress", "hz_to_mel", "mel_to_hz",
    "resample_poly", "upsample_to_48k", "output_length",
    "cheby1_sos", "host_degrade", "sosfiltfilt",
]
