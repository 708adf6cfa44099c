"""Evaluation metrics + profiling helpers.

The reference wires an ``STFTMag`` transform into the trainer for LSD-style
spectral eval but the hook is stubbed empty (reference:
src/flowhigh/utils.py:85-108, src/flowhigh/train/trainer.py:193-195,322-331).
Here the metric harness is a first-class subsystem: on-device LSD / SNR /
mel-distance, plus RTF timers for benchmarking.
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .dsp import stft_magnitude


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def log_spectral_distance(
    ref: jax.Array,      # [B, T] reference waveform
    est: jax.Array,      # [B, T] estimate
    n_fft: int = 2048,
    hop_length: int = 480,
    eps: float = 1e-8,
) -> jax.Array:
    """LSD in dB: mean_t sqrt(mean_f (log10 |S_ref|^2 - log10 |S_est|^2)^2).

    The standard audio-SR metric (the reference's STFTMag was evidently for
    this). Computed on power spectra with magnitude floor ``eps``.
    """
    mr = stft_magnitude(ref, n_fft, hop_length, n_fft, center=True,
                        pad_mode="constant")
    me = stft_magnitude(est, n_fft, hop_length, n_fft, center=True,
                        pad_mode="constant")
    lr = jnp.log10(jnp.maximum(mr * mr, eps))
    le = jnp.log10(jnp.maximum(me * me, eps))
    per_frame = jnp.sqrt(jnp.mean(jnp.square(lr - le), axis=-2))  # [B, frames]
    return jnp.mean(per_frame, axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def high_band_lsd(ref, est, n_fft: int = 2048, hop_length: int = 480,
                  cutoff_hz: float = 8000.0, sr: int = 48000) -> jax.Array:
    """LSD restricted to bins above ``cutoff_hz`` — the band SR must invent."""
    mr = stft_magnitude(ref, n_fft, hop_length, n_fft, center=True,
                        pad_mode="constant")
    me = stft_magnitude(est, n_fft, hop_length, n_fft, center=True,
                        pad_mode="constant")
    bins = mr.shape[-2]
    k0 = int(cutoff_hz / (sr / 2) * (bins - 1))
    lr = jnp.log10(jnp.maximum(mr[..., k0:, :] ** 2, 1e-8))
    le = jnp.log10(jnp.maximum(me[..., k0:, :] ** 2, 1e-8))
    return jnp.mean(jnp.sqrt(jnp.mean(jnp.square(lr - le), axis=-2)), axis=-1)


@jax.jit
def snr_db(ref: jax.Array, est: jax.Array) -> jax.Array:
    """Time-domain SNR in dB over the last axis."""
    noise = ref - est
    p_sig = jnp.sum(ref * ref, axis=-1)
    p_noise = jnp.maximum(jnp.sum(noise * noise, axis=-1), 1e-12)
    return 10.0 * jnp.log10(p_sig / p_noise)


def mel_l1(ref_mel: jax.Array, est_mel: jax.Array) -> jax.Array:
    """Mean absolute log-mel error — cheap train-time validation metric."""
    return jnp.mean(jnp.abs(ref_mel - est_mel))


def boundary_lsd(ref, est, boundaries, window: int = 24000,
                 n_fft: int = 2048, hop_length: int = 480) -> float:
    """LSD restricted to +-``window`` samples around each chunk boundary —
    the seam-quality metric for chunked long-form inference. ``ref`` is the
    single-pass (no-seam) output, ``est`` the stitched one; ``boundaries``
    are sample indices where ``est``'s chunks meet. Returns the mean LSD
    (dB) over the boundary windows, i.e. exactly the region where
    independent-chunk priors and waveform crossfades can leave artifacts."""
    import numpy as np
    ref = np.asarray(ref).reshape(-1)
    est = np.asarray(est).reshape(-1)
    t = min(len(ref), len(est))
    vals = []
    for b in boundaries:
        lo, hi = max(0, int(b) - window), min(t, int(b) + window)
        if hi - lo < n_fft:
            continue
        vals.append(float(log_spectral_distance(
            jnp.asarray(ref[None, lo:hi]), jnp.asarray(est[None, lo:hi]),
            n_fft, hop_length)[0]))
    return float(np.mean(vals)) if vals else 0.0


class RTFTimer:
    """Wall-clock real-time-factor measurement with device sync."""

    def __init__(self, audio_seconds: float):
        self.audio_seconds = audio_seconds
        self.samples: list[float] = []

    def measure(self, fn: Callable, *args, reps: int = 5, warmup: int = 1,
                **kwargs) -> float:
        for _ in range(warmup):
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            self.samples.append(time.perf_counter() - t0)
        return self.rtf

    @property
    def p50_latency(self) -> float:
        return float(np.median(self.samples))

    @property
    def rtf(self) -> float:
        return self.audio_seconds / self.p50_latency
