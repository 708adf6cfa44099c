"""Shared helpers mirroring the reference's utility surface
(reference: src/flowhigh/models/modules.py, models/common.py, utils.py)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .dsp import stft_magnitude


def exists(val) -> bool:
    return val is not None


def default(val, d):
    return val if val is not None else d


def divisible_by(num: int, den: int) -> bool:
    return (num % den) == 0


def is_odd(n: int) -> bool:
    return not divisible_by(n, 2)


def sequence_mask(lengths: jax.Array, max_length: Optional[int] = None) -> jax.Array:
    """[B] -> [B, max_length] boolean validity mask
    (reference: src/flowhigh/utils.py:78-82)."""
    if max_length is None:
        max_length = int(jnp.max(lengths))
    x = jnp.arange(max_length, dtype=lengths.dtype)
    return x[None, :] < lengths[:, None]


def interpolate_1d(t: jax.Array, length: int, mode: str = "linear") -> jax.Array:
    """Length-resample along the second-to-last axis (reference's bilinear 2D
    hack, cfm_superresolution.py:34-53, expressed directly in 1-D)."""
    assert mode in ("linear", "nearest")
    implicit = t.ndim == 2
    if implicit:
        t = t[:, None, :]
    b, d, n = t.shape
    if mode == "nearest":
        idx = jnp.clip((jnp.arange(length) * n) // length, 0, n - 1)
        out = t[..., idx]
    else:
        pos = (jnp.arange(length) + 0.5) * n / length - 0.5
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
        hi = jnp.clip(lo + 1, 0, n - 1)
        w = jnp.clip(pos - lo, 0.0, 1.0)
        out = t[..., lo] * (1 - w) + t[..., hi] * w
    return out[:, 0, :] if implicit else out


def curtail_or_pad(t: jax.Array, target_length: int) -> jax.Array:
    """Trim/zero-pad the second-to-last axis
    (reference: cfm_superresolution.py:55-63)."""
    length = t.shape[-2]
    if length > target_length:
        return t[..., :target_length, :]
    if length < target_length:
        cfg = [(0, 0)] * t.ndim
        cfg[-2] = (0, target_length - length)
        return jnp.pad(t, cfg)
    return t


def mask_from_start_end_indices(seq_len: int, start: jax.Array,
                                end: jax.Array) -> jax.Array:
    """(reference: cfm_superresolution.py:66-77)."""
    seq = jnp.arange(seq_len)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(rng: jax.Array, seq_len: int,
                           frac_lengths: jax.Array) -> jax.Array:
    """(reference: cfm_superresolution.py:79-89), traced RNG instead of torch
    in-place uniform."""
    lengths = (frac_lengths * seq_len).astype(jnp.int32)
    max_start = seq_len - lengths
    rand = jax.random.uniform(rng, frac_lengths.shape)
    start = jnp.clip((max_start * rand).astype(jnp.int32), 0, None)
    return mask_from_start_end_indices(seq_len, start, start + lengths)


def safe_log(x: jax.Array, clip_val: float = 1e-7) -> jax.Array:
    return jnp.log(jnp.clip(x, min=clip_val))


def symlog(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1)


def dynamic_range_compression(x, C=1, clip_val=1e-5):
    """(reference: modules.py:31-33)."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x, C=1):
    return jnp.exp(x) / C


class STFTMag:
    """Magnitude-STFT eval transform (reference: src/flowhigh/utils.py:85-108)."""

    def __init__(self, nfft: int = 2048, hop: int = 300, window_len: int = 1200):
        self.nfft = nfft
        self.hop = hop
        self.window_len = window_len

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim == 1:
            x = x[None, :]
        return stft_magnitude(x, self.nfft, self.hop, self.window_len,
                              center=True, pad_mode="reflect")


def model_summary(params, name: str = "model") -> str:
    """Parameter-count summary of a flax param pytree — the reference prints
    ``torchinfo.summary`` at train startup (reference:
    src/flowhigh/train/train.py:8,75). Groups counts by top-two path levels."""
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups: dict = {}
    total = 0
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        keys = [k for k in keys if k != "params"]
        group = ".".join(keys[:2]) if keys else "<root>"
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        groups[group] = groups.get(group, 0) + n
        total += n
    width = max((len(g) for g in groups), default=10)
    lines = [f"{name} parameter summary", "=" * (width + 16)]
    for g in sorted(groups):
        lines.append(f"{g:<{width}}  {groups[g]:>12,}")
    lines.append("=" * (width + 16))
    lines.append(f"{'total':<{width}}  {total:>12,}  "
                 f"({total * 4 / 2**20:.1f} MB f32)")
    return "\n".join(lines)


def hz_to_mel_htk(f):
    """HTK mel formula 2595*log10(1 + f/700) (reference: flow.py:148-151 —
    note: the reference's *filterbank* uses the Slaney formula in dsp/mel.py;
    this HTK variant backs only mel_bin_index below, and neither is called
    anywhere in the reference — kept for inventory parity)."""
    import numpy as _np
    if isinstance(f, (list, _np.ndarray)):
        f = _np.array(f)
    return 2595 * _np.log10(1 + f / 700)


def mel_bin_index(frequency, sample_rate, num_mel_bins):
    """Mel bin holding ``frequency`` on a [0, nyquist] HTK mel grid
    (reference: flow.py:153-163; dead code there, preserved for surface
    parity)."""
    import numpy as _np
    nyquist = sample_rate / 2
    m_min = hz_to_mel_htk(0)
    m_max = hz_to_mel_htk(nyquist)
    mel_value = hz_to_mel_htk(frequency)
    bin_index = _np.floor((mel_value - m_min) / (m_max - m_min) * num_mel_bins)
    if isinstance(bin_index, _np.ndarray):
        return bin_index.astype(int)
    return int(bin_index)
