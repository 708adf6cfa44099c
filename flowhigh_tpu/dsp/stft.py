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


def hann_window_np(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(hann_window_np(win_length), dtype=dtype)


def _padded_window_np(n_fft: int, win_length: int,
                      window: str = "hann") -> np.ndarray:
    """``window='rect'`` = ones(win_length): what ``torch.stft`` uses when no
    window tensor is given (the reference MRD's convention,
    reference: bigvgan/models.py:313-318). Both are center-padded to n_fft
    like torch does."""
    if window == "hann":
        win = hann_window_np(win_length)
    elif window == "rect":
        win = np.ones(win_length, np.float32)
    else:
        raise ValueError(f"unsupported window: {window!r}")
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    return win


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


@functools.lru_cache(maxsize=8)
def _dft_analysis_kernel(n_fft: int, win_length: int,
                         window: str = "hann") -> np.ndarray:
    """[n_fft, 1, 2*(n_fft//2+1)] HIO conv kernel: windowed real DFT.

    Out channels = [re_0..re_B, im_0..im_B]. Expressing the STFT as ONE
    strided MXU conv instead of gather-framing + batched rFFT: on TPU the
    frame gather lowers to a slow 1-D T(1024)-layout fusion (~18 ms for 10 s
    of audio inside a fused program) while this conv runs in ~1 ms.
    """
    bins = n_fft // 2 + 1
    win = _padded_window_np(n_fft, win_length, window)
    t = np.arange(n_fft)[:, None]
    b = np.arange(bins)[None, :]
    ang = -2.0 * np.pi * t * b / n_fft
    re = np.cos(ang) * win[:, None]
    im = np.sin(ang) * win[:, None]
    return np.concatenate([re, im], axis=1).astype(np.float32)[:, None, :]


@functools.lru_cache(maxsize=8)
def _dft_synthesis(n_fft: int, win_length: int) -> np.ndarray:
    """[n_fft, 1, 2*(n_fft//2+1)] transpose-conv kernel: windowed inverse
    real DFT (frames -> overlap-added signal via one conv_transpose)."""
    bins = n_fft // 2 + 1
    win = _padded_window_np(n_fft, win_length)
    a = np.fft.irfft(np.eye(bins), n=n_fft)           # [bins, n_fft] from re
    bmat = np.fft.irfft(1j * np.eye(bins), n=n_fft)   # [bins, n_fft] from im
    k = np.concatenate([a, bmat], axis=0) * win[None, :]  # [2*bins, n_fft]
    return k.T.astype(np.float32)[:, None, :]         # [n_fft, 1, 2*bins]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def stft(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 480,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
    window: str = "hann",
) -> jax.Array:
    """Complex STFT [..., T] -> [..., F_bins, frames] (onesided).

    ``win_length`` defaults to ``n_fft`` (scipy/torch convention).

    ``center=False`` applies *melvoco-style* reflect padding of
    ``(n_fft - hop) // 2`` per side first (so that a caller who wants truly
    unpadded frames can pre-slice); this matches the only center=False use in
    the pipeline. ``center=True`` pads ``n_fft // 2`` with ``pad_mode``.

    Implemented as one strided conv against a windowed-DFT kernel (MXU) —
    see _dft_analysis_kernel for why not gather + rfft.
    """
    if win_length is None:
        win_length = n_fft
    assert win_length <= n_fft
    x = x.astype(jnp.float32)
    x = _pad_signal(x, n_fft, hop_length, center, pad_mode)
    bins = n_fft // 2 + 1
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    n_f = 1 + (t - n_fft) // hop_length

    # fold hop-sized chunks into channels so the conv contracts over
    # K = n_pieces*hop on the MXU (a [T, 1]-channel conv has no K dim)
    n_pieces = -(-n_fft // hop_length)
    t_chunks = -(-t // hop_length) + n_pieces
    xc = jnp.pad(x.reshape((-1, t)),
                 ((0, 0), (0, t_chunks * hop_length - t)))
    xc = xc.reshape((-1, t_chunks, hop_length))       # [N, chunks, hop]

    w = jnp.asarray(_dft_analysis_kernel(n_fft, win_length, window))[:, 0, :]
    w = jnp.pad(w, ((0, n_pieces * hop_length - n_fft), (0, 0)))
    w = w.reshape(n_pieces, hop_length, 2 * bins)     # HIO

    out = jax.lax.conv_general_dilated(
        xc, w, (1,), [(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )[:, :n_f, :]                                     # [N, frames, 2*bins]
    spec = jax.lax.complex(out[..., :bins], out[..., bins:])
    spec = jnp.swapaxes(spec, -1, -2)                 # [N, bins, frames]
    return spec.reshape(batch_shape + spec.shape[-2:])


def stft_magnitude(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 480,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
    eps: float = 0.0,
    window: str = "hann",
) -> jax.Array:
    spec = stft(x, n_fft, hop_length, win_length, center, pad_mode, window)
    return jnp.sqrt(spec.real**2 + spec.imag**2 + eps)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def istft(
    spec: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 480,
    win_length: int | None = None,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT with overlap-add, ``center=True`` convention.
    ``win_length`` defaults to ``n_fft`` (scipy/torch convention).

    ``spec``: complex [..., bins, frames]. Matches ``torch.istft`` semantics:
    windowed overlap-add normalized by the window-square envelope, then the
    center padding is trimmed and the result cut/zero-padded to ``length``.

    The inverse DFT + overlap-add run as ONE transposed conv on the MXU (a
    scatter-add OLA lowers to a ~18 ms 1-D fusion on TPU); the window-square
    envelope is a trace-time numpy constant.
    """
    if win_length is None:
        win_length = n_fft
    bins = n_fft // 2 + 1
    spec = jnp.swapaxes(spec, -1, -2)  # [..., frames, bins]
    n_frames = spec.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)
    batch_shape = spec.shape[:-2]

    z = jnp.concatenate([spec.real, spec.imag], axis=-1).astype(jnp.float32)
    z = z.reshape((-1, n_frames, 2 * bins))
    w = jnp.asarray(_dft_synthesis(n_fft, win_length))  # [n_fft, 1, 2*bins]
    # inverse DFT as one MXU matmul: [N, F, 2*bins] @ [2*bins, n_fft]
    ft = jnp.einsum("nfc,tc->nft", z, w[:, 0, :],
                    preferred_element_type=jnp.float32)  # [N, F, n_fft]

    # overlap-add without scatter (and without lhs_dilation, both of which
    # fall off TPU performance cliffs): split frames into hop-sized pieces;
    # piece j of frame f lands at output row f+j — five shifted adds.
    n_pieces = -(-n_fft // hop_length)
    pad_t = n_pieces * hop_length - n_fft
    ft = jnp.pad(ft, ((0, 0), (0, 0), (0, pad_t)))
    ft = ft.reshape(ft.shape[0], n_frames, n_pieces, hop_length)
    rows = n_frames + n_pieces - 1
    acc = jnp.zeros((ft.shape[0], rows, hop_length), jnp.float32)
    for j in range(n_pieces):
        acc = acc + jnp.pad(ft[:, :, j, :],
                            ((0, 0), (j, n_pieces - 1 - j), (0, 0)))
    sig = acc.reshape(acc.shape[0], rows * hop_length)[:, :out_len]
    sig = sig.reshape(batch_shape + (out_len,))

    # static window-square OLA envelope
    win = _padded_window_np(n_fft, win_length)
    env = np.zeros(out_len, np.float32)
    for f in range(n_frames):
        env[f * hop_length : f * hop_length + n_fft] += win * win
    sig = sig / jnp.asarray(np.maximum(env, 1e-11))

    # trim the FRONT center padding only, then cut/pad to ``length`` (torch
    # semantics). A symmetric trim (out_len - pad) drops real tail samples
    # whenever hop does not divide the signal length evenly — the final
    # frame extends past length + pad, and those samples are data, not pad.
    pad = n_fft // 2
    sig = sig[..., pad:]
    if length is None:
        length = out_len - 2 * pad
    cur = sig.shape[-1]
    if cur >= length:
        sig = sig[..., :length]
    else:
        cfg = [(0, 0)] * (sig.ndim - 1) + [(0, length - cur)]
        sig = jnp.pad(sig, cfg)
    return sig
