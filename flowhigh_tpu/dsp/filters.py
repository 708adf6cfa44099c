"""Chebyshev-I low-pass degradation filters.

The training pipeline synthesizes paired low/high-res data by Chebyshev-I
low-pass filtering followed by down/up polyphase resampling
(reference: src/flowhigh/train/data.py:103-117). Filter *design* is host-side
scipy (static per (order, ripple, cutoff) — it is data-dependent per sample, so
it runs in the host data workers, like the reference's dataloader workers).

A JAX ``sosfiltfilt`` (zero-phase forward-backward biquad cascade via
``lax.scan``) is also provided so degradation can run on device for synthetic
benchmarks/tests; IIR scans don't vectorize on the time axis, so the host path
remains the production default for training data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps


@functools.lru_cache(maxsize=256)
def cheby1_sos(order: int, ripple: float, wn: float) -> np.ndarray:
    """Low-pass Chebyshev-I cascade, [n_sections, 6] (b0 b1 b2 a0 a1 a2)."""
    return sps.cheby1(order, ripple, wn, btype="lowpass", output="sos").astype(np.float64)


def host_degrade(wave: np.ndarray, sr: int, random_sr: int, order: int,
                 ripple: float, engine: str = "auto") -> np.ndarray:
    """cheby1 + sosfiltfilt + down/up resample_poly, all host-side.

    Returns the band-limited-but-48k ``up_cond`` waveform, length-matched to
    ``wave`` (reference: src/flowhigh/train/data.py:110-123).

    ``engine``: "auto" uses the native C++ chain (``flowhigh_tpu.native``,
    scipy-parity-tested, one call for the whole filter+resample chain) when
    the library builds on this host, falling back to scipy; "scipy"/"native"
    force a path ("native" raises ``NativeUnavailable`` if it can't build).
    ``FLOWHIGH_NO_NATIVE=1`` disables the native path globally.
    """
    if engine in ("auto", "native"):
        try:
            from .. import native
            return native.host_degrade(np.asarray(wave, np.float64), sr,
                                       random_sr, order, ripple)
        except Exception:
            if engine == "native":
                raise
    nyq = sr // 2
    hi = (random_sr // 2) / nyq
    sos = cheby1_sos(order, ripple, hi)
    d = sps.sosfiltfilt(sos, wave)
    down = sps.resample_poly(d, random_sr, sr)
    up = sps.resample_poly(down, sr, random_sr)
    if len(up) < len(wave):
        up = np.pad(up, (0, len(wave) - len(up)))
    elif len(up) > len(wave):
        up = up[: len(wave)]
    return np.ascontiguousarray(up)


# --- JAX zero-phase IIR (device-side option) ---------------------------------

def _sosfilt(sos: jnp.ndarray, x: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """Direct-form II transposed biquad cascade over the last axis.

    sos: [S, 6] (a0 normalized to 1), x: [..., T], zi: [..., S, 2].
    """
    b0, b1, b2 = sos[:, 0], sos[:, 1], sos[:, 2]
    a1, a2 = sos[:, 4], sos[:, 5]

    def step(carry, xt):
        # carry: [..., S, 2] filter states; xt: [...]
        z = carry

        def section(v, s):
            z1, z2, sb0, sb1, sb2, sa1, sa2 = s
            y = sb0 * v + z1
            z1n = sb1 * v + z2 - sa1 * y
            z2n = sb2 * v - sa2 * y
            return y, (z1n, z2n)

        v = xt
        z1s, z2s = [], []
        for i in range(sos.shape[0]):
            v, (z1n, z2n) = section(
                v, (z[..., i, 0], z[..., i, 1], b0[i], b1[i], b2[i], a1[i], a2[i])
            )
            z1s.append(z1n)
            z2s.append(z2n)
        znew = jnp.stack([jnp.stack(z1s, axis=-1), jnp.stack(z2s, axis=-1)], axis=-1)
        return znew, v

    _, y = jax.lax.scan(step, zi, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def sosfiltfilt(sos_np: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase filtering matching scipy.signal.sosfiltfilt (odd padding)."""
    sos_np = np.asarray(sos_np, dtype=np.float64)
    n_sections = sos_np.shape[0]
    ntaps = 2 * n_sections + 1
    ntaps -= min((sos_np[:, 2] == 0).sum(), (sos_np[:, 5] == 0).sum())
    padlen = 3 * int(ntaps)
    zi_np = sps.sosfilt_zi(sos_np)  # [S, 2]

    # SOS cascades are numerically stable in f32 (that's what the form is for);
    # f64 is unavailable on TPU anyway.
    sos = jnp.asarray(sos_np, dtype=jnp.float32)
    zi = jnp.asarray(zi_np, dtype=jnp.float32)
    x = x.astype(jnp.float32)

    # odd-extension padding
    left = 2 * x[..., :1] - x[..., 1 : padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1 : -1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    batch = ext.shape[:-1]
    zi_b = jnp.broadcast_to(zi, batch + zi.shape)

    y = _sosfilt(sos, ext, zi_b * ext[..., :1][..., None])
    y = y[..., ::-1]
    y = _sosfilt(sos, y, zi_b * y[..., :1][..., None])
    y = y[..., ::-1]
    y = y[..., padlen:-padlen]
    return y.astype(jnp.float32)
