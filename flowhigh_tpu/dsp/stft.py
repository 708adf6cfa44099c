"""STFT / iSTFT for TPU.

TPU-native framing + windowed real FFT. Two framing conventions are needed by
the pipeline (see reference parity targets):

- ``center=False`` with explicit reflect pre-padding of ``(n_fft - hop) // 2``
  on each side — the mel-codec frontend convention
  (reference: src/flowhigh/models/melvoco.py:74-79).
- ``center=True`` with zero ("constant") padding of ``n_fft // 2`` — the
  spectral post-processing convention
  (reference: src/flowhigh/postprocessing.py:7-8, torchaudio Spectrogram
  defaults).

Everything here is shape-static and jit-friendly: the frame count is a pure
function of the (static) input length, so the whole wav->mel->wav pipeline
compiles to a single XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def num_frames(n_samples: int, n_fft: int, hop_length: int, center: bool) -> int:
    """Frame count of an STFT over ``n_samples`` (static python int math)."""
    if center:
        n_samples = n_samples + 2 * (n_fft // 2)
    return 1 + (n_samples - n_fft) // hop_length


def frame_signal(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """[..., T] -> [..., F, frame_length] overlapping frames (no padding).

    Uses a gather with a static index matrix; XLA lowers this to an efficient
    strided copy and fuses the subsequent window multiply.
    """
    t = x.shape[-1]
    n = 1 + (t - frame_length) // hop_length
    idx = (
        np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )  # [F, frame_length], static
    return x[..., idx]


def _pad_signal(x: jax.Array, n_fft: int, hop_length: int, center: bool,
                pad_mode: str) -> jax.Array:
    if center:
        pad = n_fft // 2
    else:
        pad = (n_fft - hop_length) // 2
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    if pad_mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    elif pad_mode == "constant":
        return jnp.pad(x, cfg, mode="constant")
    else:
        raise ValueError(f"unsupported pad_mode: {pad_mode}")


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def stft(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 480,
    win_length: int = 2048,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT [..., T] -> [..., F_bins, frames] (onesided).

    ``center=False`` applies *melvoco-style* reflect padding of
    ``(n_fft - hop) // 2`` per side first (so that a caller who wants truly
    unpadded frames can pre-slice); this matches the only center=False use in
    the pipeline. ``center=True`` pads ``n_fft // 2`` with ``pad_mode``.
    """
    assert win_length <= n_fft
    x = x.astype(jnp.float32)
    x = _pad_signal(x, n_fft, hop_length, center, pad_mode)
    frames = frame_signal(x, n_fft, hop_length)  # [..., F, n_fft]
    win = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    frames = frames * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., F, n_fft//2+1]
    return jnp.swapaxes(spec, -1, -2)  # [..., bins, frames]


def stft_magnitude(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 480,
    win_length: int = 2048,
    center: bool = True,
    pad_mode: str = "reflect",
    eps: float = 0.0,
) -> jax.Array:
    spec = stft(x, n_fft, hop_length, win_length, center, pad_mode)
    return jnp.sqrt(spec.real**2 + spec.imag**2 + eps)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def istft(
    spec: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 480,
    win_length: int = 2048,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT with overlap-add, ``center=True`` convention.

    ``spec``: complex [..., bins, frames]. Matches ``torch.istft`` semantics:
    windowed overlap-add normalized by the window-square envelope, then the
    center padding is trimmed and the result cut/zero-padded to ``length``.
    """
    spec = jnp.swapaxes(spec, -1, -2)  # [..., frames, bins]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [..., frames, n_fft]
    win = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    frames = frames * win

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # Overlap-add via scatter-add on a static index map.
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    ).reshape(-1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape(batch_shape + (-1,))
    sig = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
    sig = sig.at[..., idx].add(flat)

    env = jnp.zeros((out_len,), dtype=frames.dtype)
    env = env.at[idx].add(jnp.tile(win * win, (n_frames,)))
    sig = sig / jnp.maximum(env, 1e-11)

    # trim center padding
    pad = n_fft // 2
    sig = sig[..., pad : out_len - pad]
    if length is not None:
        cur = sig.shape[-1]
        if cur >= length:
            sig = sig[..., :length]
        else:
            cfg = [(0, 0)] * (sig.ndim - 1) + [(0, length - cur)]
            sig = jnp.pad(sig, cfg)
    return sig
