"""Polyphase resampling — scipy.signal.resample_poly parity, on device.

The reference upsamples on the host with ``scipy.signal.resample_poly``
(reference: src/flowhigh/flowhighsr.py:68, src/flowhigh/train/data.py:116-117).
Here the FIR is designed once on the host (static per (up, down) pair, Kaiser
beta=5.0 windowed sinc exactly like scipy) and the upfirdn runs on device as a
single fractionally-strided convolution: ``lhs_dilation=up`` performs the
zero-stuffing, ``window_strides=down`` the decimation, and XLA fuses the whole
thing — no host round-trip in the generate() path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin


@functools.lru_cache(maxsize=64)
def _design(up: int, down: int, design: str = "scipy") -> tuple[np.ndarray, int, int]:
    """Windowed-sinc FIR + alignment offsets.

    ``design='scipy'``: Kaiser beta=5.0, 10*max_rate half-length — exact
    ``scipy.signal.resample_poly`` parity (the reference's default
    upsampler, flowhighsr.py:68). ``design='soxr_hq'``: the reference's
    ``upsampling_method='librosa'`` path calls librosa.resample with
    res_type soxr_hq (train/data.py:77-78) — soxr itself is a C library
    with no public tap values, so bit-parity is not reproducible; this mode
    matches its *specs* instead (HQ preset: ~120 dB stopband rejection,
    passband to ~0.92 Nyquist) via a long Kaiser design
    (beta = 0.1102*(A-8.7), A = 120 dB).

    Returns (padded filter h, n_pre_remove, half_len) where ``h`` already
    includes the pre-padding so output sample k of the decimated full
    convolution at index ``k + n_pre_remove`` aligns with scipy's output.
    """
    max_rate = max(up, down)
    if design == "scipy":
        f_c = 1.0 / max_rate
        half_len = 10 * max_rate
        beta = 5.0
    elif design == "soxr_hq":
        f_c = 0.96 / max_rate       # transition band [0.92, 1.0] * Nyquist
        half_len = 32 * max_rate    # long enough for ~120 dB at that width
        beta = 0.1102 * (120.0 - 8.7)
    else:
        raise ValueError(f"unknown FIR design {design!r}")
    h = firwin(2 * half_len + 1, f_c, window=("kaiser", beta)).astype(np.float64)
    h *= up
    n_pre_pad = down - half_len % down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    n_pre_remove = (half_len + n_pre_pad) // down
    return h.astype(np.float32), n_pre_remove, half_len


def output_length(n: int, up: int, down: int) -> int:
    g = math.gcd(up, down)
    up, down = up // g, down // g
    return -(-(n * up) // down)


@functools.lru_cache(maxsize=64)
def _polyphase_bank(up: int, down: int,
                    design: str = "scipy") -> tuple[np.ndarray, int, int]:
    """Polyphase filter bank W[phase, taps] such that the upfirdn output
    y[c + m*up] = sum_k W[c, k] * x[s0 + m*down + k] (cross-correlation).

    Derivation: y[n] = sum_j x[j] h[(n + pre)*down - j*up] (scipy upfirdn with
    the pre-pad alignment of _design). Substituting n = c + m*up and
    j = s0 + m*down + k makes the m-terms cancel, leaving
    W[c, k] = h[(c + pre)*down - (s0 + k)*up]. No input dilation — this
    compiles to a plain strided conv with ``up`` output channels (the
    lhs_dilation form pathologically slows the TPU conv compiler).
    """
    h, pre, _ = _design(up, down, design)
    lh = len(h)
    # choose s0 so that k >= 0 covers every tap for every phase
    s0 = min(((c + pre) * down - (lh - 1)) // up for c in range(up))
    k_max = max(((c + pre) * down) // up for c in range(up)) - s0
    w = np.zeros((up, k_max + 1), np.float32)
    for c in range(up):
        for k in range(k_max + 1):
            idx = (c + pre) * down - (s0 + k) * up
            if 0 <= idx < lh:
                w[c, k] = h[idx]
    return w, s0, k_max + 1


def resample_poly(x: jax.Array, up: int, down: int,
                  design: str = "scipy") -> jax.Array:
    """[..., T] -> [..., ceil(T*up/down)]; numerically matches scipy (f32).
    ``design='soxr_hq'`` swaps in the librosa/soxr-grade FIR (see _design)."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    n_in = x.shape[-1]
    n_out = output_length(n_in, up, down)
    w, s0, kw = _polyphase_bank(up, down, design)

    m_out = -(-n_out // up)  # per-phase output count
    # x[j] needed for j in [s0, s0 + (m_out-1)*down + kw)
    pad_left = max(0, -s0)
    j_max = s0 + (m_out - 1) * down + kw
    pad_right = max(0, j_max - n_in)

    batch_shape = x.shape[:-1]
    lhs = x.reshape((-1, 1, n_in)).astype(jnp.float32)
    lhs = jnp.pad(lhs, ((0, 0), (0, 0), (pad_left, pad_right)))
    lhs = lax_slice_start(lhs, s0 + pad_left)
    rhs = jnp.asarray(w).reshape(up, 1, kw)  # OIH: phases as output channels

    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(down,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [N, up, >= m_out]
    out = out[:, :, :m_out]                       # [N, up, m_out]
    y = jnp.swapaxes(out, 1, 2).reshape(out.shape[0], -1)  # interleave phases
    return y[:, :n_out].reshape(batch_shape + (n_out,))


def lax_slice_start(x: jax.Array, start: int) -> jax.Array:
    return x[..., start:] if start > 0 else x


def upsample_to_48k(x: jax.Array, sr: int, target_sr: int = 48000,
                    design: str = "scipy") -> jax.Array:
    """Host-DSP step of generate() as an on-device op
    (reference: src/flowhigh/flowhighsr.py:66-69)."""
    return resample_poly(x, target_sr, sr, design)
