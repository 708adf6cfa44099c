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
def _design(up: int, down: int) -> tuple[np.ndarray, int, int]:
    """Kaiser-windowed sinc FIR + alignment offsets (scipy resample_poly parity).

    Returns (padded filter h, n_pre_remove, half_len) where ``h`` already
    includes scipy's pre-padding so output sample k of the decimated full
    convolution at index ``k + n_pre_remove`` aligns with scipy's output.
    """
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0)).astype(np.float64)
    h *= up
    n_pre_pad = down - half_len % down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    n_pre_remove = (half_len + n_pre_pad) // down
    return h.astype(np.float32), n_pre_remove, half_len


def output_length(n: int, up: int, down: int) -> int:
    g = math.gcd(up, down)
    up, down = up // g, down // g
    return -(-(n * up) // down)


def resample_poly(x: jax.Array, up: int, down: int) -> jax.Array:
    """[..., T] -> [..., ceil(T*up/down)]; numerically matches scipy (f32)."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    n_in = x.shape[-1]
    n_out = output_length(n_in, up, down)
    h, n_pre_remove, _ = _design(up, down)
    k = len(h)

    batch_shape = x.shape[:-1]
    lhs = x.reshape((-1, 1, n_in)).astype(jnp.float32)  # [N, C=1, T]
    rhs = jnp.asarray(h[::-1].copy()).reshape((1, 1, k))  # flip: XLA convs correlate

    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [N, 1, ceil(((n_in-1)*up + 2k-1 - k + 1)/down)]
    out = out[:, 0, n_pre_remove : n_pre_remove + n_out]
    return out.reshape(batch_shape + (n_out,))


def upsample_to_48k(x: jax.Array, sr: int, target_sr: int = 48000) -> jax.Array:
    """Host-DSP step of generate() as an on-device op
    (reference: src/flowhigh/flowhighsr.py:66-69)."""
    return resample_poly(x, target_sr, sr)
