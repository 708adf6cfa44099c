"""Spectral post-processing: preserve the source's low band.

Re-design of the reference PostProcessing
(reference: src/flowhigh/postprocessing.py:5-41): STFT both waveforms
(center=True, zero padding — the torchaudio Spectrogram convention used
there), find the source's cumulative-energy cutoff bin (>= 99% threshold),
splice source bins below the cutoff into the prediction's spectrum, iSTFT
back at the source length, peak-normalize to 0.99.

The reference's python cutoff loop (postprocessing.py:10-16) forced a
device->host sync per clip; here it is a vectorized cumsum+count that stays
inside the same XLA program as the STFTs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cfm import cutoff_bins_from_energy
from .dsp import istft, stft


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def post_process(
    pred: jax.Array,   # [B, T] predicted 48 kHz waveform
    src: jax.Array,    # [B, T] upsampled source waveform
    length: int,
    n_fft: int = 2048,
    hop_length: int = 480,
    threshold: float = 0.99,
) -> jax.Array:
    spec_pred = stft(pred, n_fft, hop_length, n_fft, center=True, pad_mode="constant")
    spec_src = stft(src, n_fft, hop_length, n_fft, center=True, pad_mode="constant")

    t = min(spec_pred.shape[-1], spec_src.shape[-1])
    spec_pred = spec_pred[..., :t]
    spec_src = spec_src[..., :t]

    # per-item cutoff bin on the linear STFT magnitude
    energy = jnp.sum(jnp.abs(spec_src), axis=-1)        # [B, bins]
    cr = cutoff_bins_from_energy(energy, threshold)     # [B]

    bins = jnp.arange(spec_pred.shape[-2])
    take_pred = bins[None, :, None] >= cr[:, None, None]
    spec_out = jnp.where(take_pred, spec_pred, spec_src)

    audio = istft(spec_out, n_fft, hop_length, n_fft, length=length)
    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    return audio / jnp.maximum(peak, 1e-8) * 0.99


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def post_process_with_phase(
    pred: jax.Array,
    src: jax.Array,
    length: int,
    n_fft: int = 2048,
    hop_length: int = 480,
    threshold: float = 0.99,
) -> jax.Array:
    """Phase-replication variant: high-band magnitude from the prediction,
    phase tiled up from the source's low band
    (reference: src/flowhigh/postprocessing.py:43-79), vectorized — the
    reference's repeat+slice phase tiling becomes a modular gather.
    """
    spec_pred = stft(pred, n_fft, hop_length, n_fft, center=True, pad_mode="constant")
    spec_src = stft(src, n_fft, hop_length, n_fft, center=True, pad_mode="constant")

    t = min(spec_pred.shape[-1], spec_src.shape[-1])
    spec_pred = spec_pred[..., :t]
    spec_src = spec_src[..., :t]

    energy = jnp.sum(jnp.abs(spec_src), axis=-1)
    cr = jnp.maximum(cutoff_bins_from_energy(energy, threshold), 1)  # [B]

    bins = spec_pred.shape[-2]
    b_idx = jnp.arange(bins)
    # reference tiling: tile the cr low-band phase rows, keep the LAST
    # (bins - cr) rows == source row (b_idx - bins) mod cr
    src_row = jnp.mod(b_idx[None, :] - bins, cr[:, None])          # [B, bins]
    phase = jnp.angle(spec_src)
    rep_phase = jnp.take_along_axis(phase, src_row[..., None], axis=1)

    high = jnp.abs(spec_pred) * jnp.exp(1j * rep_phase)
    spec_out = jnp.where(b_idx[None, :, None] >= cr[:, None, None], high, spec_src)

    audio = istft(spec_out, n_fft, hop_length, n_fft, length=length)
    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    return audio / jnp.maximum(peak, 1e-8) * 0.99
