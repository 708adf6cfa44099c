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




# cos(2*pi*r) on r in [-0.5, 0.5] as an even minimax-style polynomial.
# Mosaic's builtin cos lowers to ~100 VPU ops/element (measured: the snake
# transcendental was 57% of the packed act kernel's time); period reduction
# + 7-term Horner is ~12 ops. Accuracy: 5.7e-7 for the polynomial itself;
# ~3.6e-6 max abs error end-to-end in f32 Horner over |x| <= 50 (the f32
# range-reduction subtraction dominates) — well inside the 2e-5 kernel
# parity tolerances.
_COS_COEFFS = (9.999999922856e-01, -1.973920555234e+01, 6.493917213579e+01,
               -8.545116383103e+01, 6.017621268245e+01, -2.600045568122e+01,
               6.575502264016e+00)


def fast_cos(x):
    """cos(x) via f32 period reduction + even polynomial; max abs error
    ~3.6e-6 in f32 for |x| up to ~50, growing with |x| as the f32 multiply
    by 1/(2*pi) loses phase bits — exactly like any single-precision range
    reduction."""
    t = x * float(1.0 / (2.0 * np.pi))
    r = t - jnp.round(t)
    r2 = r * r
    acc = jnp.full_like(x, _COS_COEFFS[-1])
    for coef in _COS_COEFFS[-2::-1]:
        acc = acc * r2 + coef
    return acc


def _snake_tile(u, alpha, beta, logscale: bool, has_beta: bool):
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta) if has_beta else alpha
    elif not has_beta:
        beta = alpha
    # x + (1/b) sin^2(ax) = x + (0.5/b) - (0.5/b) cos(2ax): one transcendental
    # per element instead of sin+square (the kernel is VPU-compute-bound)
    half_inv_b = 0.5 / (beta + 1e-9)
    return u + half_inv_b - half_inv_b * fast_cos(u * (2.0 * alpha))


def _make_kernel(logscale: bool, has_beta: bool, tile_t: int, c_blk: int):
    h, we, wo = _filters()

    def kernel(cur_ref, prev_ref, nxt_ref, ab_ref, out_ref):
        # main data comes straight from x (no padded copy); the 6-row left and
        # 10-row right halos are tiny pre-gathered strips. The kernel is HBM
        # bandwidth-bound, so the glue traffic matters more than the math.
        lx = jnp.concatenate([
            prev_ref[0].astype(jnp.float32),          # [8, c]  (rows 2..8 used)
            cur_ref[0].astype(jnp.float32),           # [tile_t, c]
            nxt_ref[0].astype(jnp.float32),           # [16, c] (first 10 used)
        ], axis=0)
        # lx row r corresponds to xp[i*tile_t + r - 2] in the old indexing
        # (xp = 6-left-padded x); i.e. lx[2 + k] == old lx[k].

        alpha = ab_ref[0, :]
        beta = ab_ref[1, :]

        n_s = tile_t + 6
        se = jnp.zeros((n_s, c_blk), jnp.float32)
        so = jnp.zeros((n_s, c_blk), jnp.float32)
        for k in range(6):
            se = se + we[k] * lx[2 + k : 2 + k + n_s, :]
            so = so + wo[k] * lx[3 + k : 3 + k + n_s, :]
        se = _snake_tile(se, alpha, beta, logscale, has_beta)
        so = _snake_tile(so, alpha, beta, logscale, has_beta)

        y = jnp.zeros((tile_t, c_blk), jnp.float32)
        for m in range(-2, 4):
            y = y + h[2 * m + 5] * se[3 + m : 3 + m + tile_t, :]
        for m in range(-3, 3):
            y = y + h[2 * m + 6] * so[3 + m : 3 + m + tile_t, :]
        out_ref[0, :, :] = y.astype(out_ref.dtype)

    return kernel


def _pick_tile(t: int, cap: int = TILE_T) -> int:
    """Largest multiple-of-8 divisor of t up to ``cap`` (audio/vocoder
    lengths are highly composite); 0 if none — caller pads."""
    best = 0
    for cand in range(min(cap, t), 7, -8):
        if t % cand == 0:
            best = cand
            break
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_snake_activation1d(x: jax.Array, alpha: jax.Array,
                             beta: Optional[jax.Array],
                             logscale: bool = True,
                             interpret: bool = False) -> jax.Array:
    """[B, T, C] -> [B, T, C]: downsample2(snake(upsample2(x))), fused.

    ``beta=None`` selects plain snake (alpha only). Exact parity with the
    unfused XLA composition (up to f32 reassociation). I/O dtype follows x
    (bf16 halves HBM traffic — the op is bandwidth-bound); compute is f32.
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
    io_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32

    tile_t = _pick_tile(t)
    c_blk = min(c, TILE_C)  # Mosaic lane-pads narrow C; wide C splits in 128s
    if tile_t == 0:  # awkward length: pad up to a multiple of 8 and recurse
        t_pad = -(-max(64, t) // 8) * 8
        xq = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)), mode="edge")
        return _fused_fwd_impl(xq, alpha, beta, logscale, interpret)[:, :t, :]
    n_tiles = t // tile_t

    # tiny halo strips gathered straight from x (edge-clamped indices give the
    # up stage's replicate padding); strips are 16/tile_t of the main traffic
    idx_prev = np.clip(
        (np.arange(n_tiles)[:, None] * tile_t - 8 + np.arange(8)[None, :]),
        0, t - 1).reshape(-1)
    idx_next = np.clip(
        ((np.arange(n_tiles)[:, None] + 1) * tile_t + np.arange(16)[None, :]),
        0, t - 1).reshape(-1)
    xq = x.astype(io_dtype)
    prev = xq[:, idx_prev, :].reshape(bsz, n_tiles * 8, c)
    nxt = xq[:, idx_next, :].reshape(bsz, n_tiles * 16, c)

    ab = jnp.stack([
        jnp.pad(alpha.astype(jnp.float32), (0, max(0, c_blk - c))),
        jnp.pad((beta if has_beta else alpha).astype(jnp.float32),
                (0, max(0, c_blk - c))),
    ])[:, :c_blk]  # [2, c_blk]

    kernel = _make_kernel(logscale, has_beta, tile_t, c_blk)
    n_cb = -(-c // c_blk)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), io_dtype),
        grid=(bsz, n_tiles, n_cb),
        in_specs=[
            pl.BlockSpec((1, tile_t, c_blk), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c_blk), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, c_blk), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_blk), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, c_blk), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xq, prev, nxt, ab)

    # exact edge patch: down replicate-pads s in interleaved index space.
    # Output stays in io_dtype — a cast back to f32 here would cost a full
    # conversion copy of a bandwidth-bound op's output.
    y = _patch_edges(y, x.astype(jnp.float32), alpha, beta, logscale, has_beta,
                     h, we, wo)
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
    y = jax.lax.dynamic_update_slice_in_dim(y, left.astype(y.dtype), 0, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(y, right.astype(y.dtype),
                                               t - 3, axis=1)


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
