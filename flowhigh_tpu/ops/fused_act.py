"""Fused anti-aliased snake activation — Pallas TPU kernel.

The BigVGAN hot loop applies, per conv layer, the chain
2x-upsample -> snake(beta) -> 2x-downsample
(reference: src/flowhigh/models/bigvgan/alias_free_torch/act.py:8-27). As
three XLA ops this is memory-bound: the 2x-length intermediate goes to HBM
twice. This kernel computes the whole chain in one VMEM pass per
(time-tile, channel-tile), so HBM traffic drops from ~5 T·C floats to 2 T·C.

Polyphase algebra (probed numerically against the XLA path, h = the 12-tap
Kaiser-sinc half-band filter of kaiser_sinc_filter1d(0.25, 0.3, 12)):

    u[2t]   = 2 * sum_k h[2k]   * x[t-3+k]      k = 0..5
    u[2t+1] = 2 * sum_k h[2k+1] * x[t-2+k]      k = 0..5
    s       = snake(u)
    y[n]    = sum_j h[j] * s[2n + j - 5]        j = 0..11

Edges: the up stage replicate-pads x (handled by feeding the kernel an
edge-padded input), while the down stage replicate-pads *s* in interleaved
index space — the first/last 3 outputs therefore need clamped s indices and
are recomputed exactly in plain XLA (6 samples per call, negligible).

Backward pass: custom_vjp falling back to jax.vjp of the unfused XLA
composition — the kernel serves the inference/serving path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bigvgan import (downsample1d, kaiser_sinc_filter1d, snake,
                              snake_beta, upsample1d)

TILE_T = 1024
TILE_C = 128
HALO = 16  # rows borrowed from the next block (logical halo is 12)


def _filters():
    h = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float32)
    we = 2.0 * h[0::2]  # even-phase up taps
    wo = 2.0 * h[1::2]  # odd-phase up taps
    return h, we, wo


def _snake_tile(u, alpha, beta, logscale: bool, has_beta: bool):
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta) if has_beta else alpha
    elif not has_beta:
        beta = alpha
    return u + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(u * alpha))


def _make_kernel(logscale: bool, has_beta: bool, tile_t: int):
    h, we, wo = _filters()

    def kernel(cur_ref, nxt_ref, ab_ref, out_ref):
        # halo rows come from the next block (same array, index_map i+1), so
        # Mosaic's grid pipeline double-buffers all loads automatically —
        # no manual DMA/semaphores, traffic overlaps compute.
        lx_main = cur_ref[0]                     # [tile_t, TILE_C]
        lx_halo = nxt_ref[0, :HALO, :]           # [HALO, TILE_C]
        lx = jnp.concatenate([lx_main, lx_halo], axis=0)

        alpha = ab_ref[0, :]
        beta = ab_ref[1, :]

        # s_e/s_o on [tile_t + 6) local time steps
        n_s = tile_t + 6
        se = jnp.zeros((n_s, TILE_C), jnp.float32)
        so = jnp.zeros((n_s, TILE_C), jnp.float32)
        for k in range(6):
            se = se + we[k] * lx[k : k + n_s, :]
            so = so + wo[k] * lx[k + 1 : k + 1 + n_s, :]
        se = _snake_tile(se, alpha, beta, logscale, has_beta)
        so = _snake_tile(so, alpha, beta, logscale, has_beta)

        # y[n'] = sum_m h[2m+5] s_e[n'+3+m] + h[2m+6] s_o[n'+3+m]
        y = jnp.zeros((tile_t, TILE_C), jnp.float32)
        for m in range(-2, 4):
            y = y + h[2 * m + 5] * se[3 + m : 3 + m + tile_t, :]
        for m in range(-3, 3):
            y = y + h[2 * m + 6] * so[3 + m : 3 + m + tile_t, :]
        out_ref[0, :, :] = y

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_snake_activation1d(x: jax.Array, alpha: jax.Array,
                             beta: Optional[jax.Array],
                             logscale: bool = True,
                             interpret: bool = False) -> jax.Array:
    """[B, T, C] -> [B, T, C]: downsample2(snake(upsample2(x))), fused.

    ``beta=None`` selects plain snake (alpha only). Exact parity with the
    unfused XLA composition (up to f32 reassociation).
    """
    return _fused_fwd_impl(x, alpha, beta, logscale, interpret)


def _fused_fwd_impl(x, alpha, beta, logscale, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic kernels only compile for TPU; elsewhere (CPU tests) interpret.
    interpret = interpret or jax.default_backend() != "tpu"

    bsz, t, c = x.shape
    has_beta = beta is not None
    h, we, wo = _filters()

    tile_t = TILE_T if t >= TILE_T else -(-max(64, t) // 8) * 8
    t_pad = -(-t // tile_t) * tile_t
    c_pad = -(-c // TILE_C) * TILE_C

    # edge-pad time by 6 each side (up's replicate semantics), then extend to
    # t_pad + one extra donor block so every tile's "next" halo block exists
    right = (t_pad + tile_t) - t - 6
    xp = jnp.pad(x, ((0, 0), (6, 6), (0, 0)), mode="edge")
    xp = jnp.pad(xp, ((0, 0), (0, right), (0, 0)), mode="edge")
    if c_pad > c:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, c_pad - c)))

    ab = jnp.stack([
        jnp.pad(alpha.astype(jnp.float32), (0, c_pad - c)),
        jnp.pad((beta if has_beta else alpha).astype(jnp.float32), (0, c_pad - c)),
    ])  # [2, c_pad]

    kernel = _make_kernel(logscale, has_beta, tile_t)
    block = pl.BlockSpec((1, tile_t, TILE_C), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM)
    halo_block = pl.BlockSpec((1, tile_t, TILE_C), lambda b, i, j: (b, i + 1, j),
                              memory_space=pltpu.VMEM)
    xpf = xp.astype(jnp.float32)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, c_pad), jnp.float32),
        grid=(bsz, t_pad // tile_t, c_pad // TILE_C),
        in_specs=[
            block,       # current tile
            halo_block,  # next tile (halo donor)
            pl.BlockSpec((2, TILE_C), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=block,
        interpret=interpret,
    )(xpf, xpf, ab)
    y = y[:, :t, :c]

    # exact edge patch: down replicate-pads s in interleaved index space
    y = _patch_edges(y, x, alpha, beta, logscale, has_beta, h, we, wo)
    return y


def _patch_edges(y, x, alpha, beta, logscale, has_beta, h, we, wo):
    t = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (6, 6), (0, 0)), mode="edge")

    def s_at(tloc_slice):  # s_e,s_o for global t in slice -> [B, n, C] each
        se = sum(we[k] * xp[:, tloc_slice.start + 6 - 3 + k:
                            tloc_slice.stop + 6 - 3 + k, :] for k in range(6))
        so = sum(wo[k] * xp[:, tloc_slice.start + 6 - 2 + k:
                            tloc_slice.stop + 6 - 2 + k, :] for k in range(6))
        if has_beta:
            se = snake_beta(se, alpha, beta, logscale)
            so = snake_beta(so, alpha, beta, logscale)
        else:
            se = snake(se, alpha, logscale)
            so = snake(so, alpha, logscale)
        return se, so

    # left: s[0..11] interleaved; y[n] = sum_j h[j] s[clip(2n+j-5, 0, 2t-1)]
    se_l, so_l = s_at(slice(0, 6))
    s_l = jnp.stack([se_l, so_l], axis=2).reshape(x.shape[0], 12, x.shape[2])
    rows = []
    for n in range(3):
        acc = 0.0
        for j in range(12):
            idx = min(max(2 * n + j - 5, 0), 2 * t - 1)
            acc = acc + h[j] * s_l[:, min(idx, 11), :]
        rows.append(acc)
    left = jnp.stack(rows, axis=1)

    se_r, so_r = s_at(slice(t - 6, t))
    s_r = jnp.stack([se_r, so_r], axis=2).reshape(x.shape[0], 12, x.shape[2])
    rows = []
    for n in range(t - 3, t):
        acc = 0.0
        for j in range(12):
            idx = min(max(2 * n + j - 5, 0), 2 * t - 1)
            acc = acc + h[j] * s_r[:, idx - (2 * t - 12), :]
        rows.append(acc)
    right = jnp.stack(rows, axis=1)

    # in-place row updates (XLA lowers these as dynamic-update-slice, no
    # full-array concat copies)
    y = jax.lax.dynamic_update_slice_in_dim(y, left, 0, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(y, right, t - 3, axis=1)


def _reference_act(x, alpha, beta, logscale, has_beta):
    u = upsample1d(x, 2, 12)
    if has_beta:
        s = snake_beta(u, alpha, beta, logscale)
    else:
        s = snake(u, alpha, logscale)
    return downsample1d(s, 2, 12)


def _fwd(x, alpha, beta, logscale, interpret):
    y = _fused_fwd_impl(x, alpha, beta, logscale, interpret)
    return y, (x, alpha, beta)


def _bwd(logscale, interpret, res, g):
    x, alpha, beta = res
    has_beta = beta is not None
    if has_beta:
        _, vjp = jax.vjp(
            lambda xx, aa, bb: _reference_act(xx, aa, bb, logscale, True),
            x, alpha, beta)
        return vjp(g)
    _, vjp = jax.vjp(
        lambda xx, aa: _reference_act(xx, aa, None, logscale, False), x, alpha)
    dx, da = vjp(g)
    return dx, da, None


fused_snake_activation1d.defvjp(_fwd, _bwd)
