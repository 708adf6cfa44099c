"""Mel filterbank (Slaney scale, Slaney normalization — librosa.filters.mel parity).

The reference computes its 256-band filterbank with
``librosa.filters.mel(sr=48000, n_fft=2048, n_mels=256, fmin=20, fmax=24000)``
(reference: src/flowhigh/models/melvoco.py:63-71) which defaults to
``htk=False`` (Slaney mel scale) and ``norm='slaney'`` (area normalization).
The basis is a compile-time constant: designed once in numpy at trace time and
baked into the XLA program, applied as a single [n_mels, bins] x [bins, T]
matmul that XLA maps onto the MXU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_F_SP = 200.0 / 3.0  # Slaney: Hz per mel below 1 kHz
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP  # 15.0
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f):
    f = np.asanyarray(f, dtype=np.float64)
    mel = f / _F_SP
    return np.where(f >= _MIN_LOG_HZ, _MIN_LOG_MEL + np.log(f / _MIN_LOG_HZ) / _LOGSTEP, mel)


def mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f = m * _F_SP
    return np.where(m >= _MIN_LOG_MEL, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = 48000,
    n_fft: int = 2048,
    n_mels: int = 256,
    fmin: float = 20.0,
    fmax: float = 24000.0,
) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] float32 triangular filterbank (librosa parity)."""
    fmax = float(fmax if fmax is not None else sr / 2)
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)

    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)  # [n_mels + 2]

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # [n_mels+2, bins]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def hz_to_mel_htk_np(f):
    f = np.asanyarray(f, dtype=np.float64)
    return 2595.0 * np.log10(1.0 + f / 700.0)


def mel_to_hz_htk_np(m):
    m = np.asanyarray(m, dtype=np.float64)
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank_htk(
    sr: int = 48000,
    n_fft: int = 2048,
    n_mels: int = 256,
    fmin: float = 0.0,
    fmax: float = 24000.0,
) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] float32 filterbank, torchaudio
    ``melscale_fbanks`` parity (HTK mel scale, ``norm=None`` — the
    ``T.MelScale`` defaults the reference's alternative encode path uses,
    reference: melvoco.py:101-106). Unlike the librosa/Slaney bank above:
    HTK 2595*log10(1+f/700) spacing, no area normalization, and FFT bin
    frequencies spaced over ``sr // 2`` (torchaudio floor-divides)."""
    fmax = float(fmax if fmax is not None else sr / 2)
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr // 2, n_bins)

    mel_pts = np.linspace(hz_to_mel_htk_np(fmin), hz_to_mel_htk_np(fmax),
                          n_mels + 2)
    hz_pts = mel_to_hz_htk_np(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    return np.maximum(0.0, np.minimum(lower, upper)).astype(np.float32)


def apply_mel(spec_mag: jnp.ndarray, basis: np.ndarray) -> jnp.ndarray:
    """[..., bins, T] magnitude -> [..., n_mels, T] mel spectrogram (MXU matmul)."""
    return jnp.einsum(
        "mb,...bt->...mt", jnp.asarray(basis), spec_mag,
        preferred_element_type=jnp.float32,
    )


def log_compress(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """Dynamic-range compression log(clamp(x, 1e-5))
    (reference: src/flowhigh/models/modules.py:31-36)."""
    return jnp.log(jnp.clip(x, min=clip_val))
