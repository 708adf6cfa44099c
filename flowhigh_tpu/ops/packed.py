"""Space-to-depth ("packed") vocoder ops — the narrow-channel fast path.

The BigVGAN MRF stages at C in {192, 96, 48} dominate the vocoder's runtime
(reference hot path: src/flowhigh/models/bigvgan/models.py:172-194). On TPU,
f32 arrays tile as (8 sublanes, 128 lanes), so a [T, 48] feature map is
physically stored 128 lanes wide — a 2.67x HBM-traffic tax on every one of
the ~72 elementwise/conv passes per stage (PERF.md round-1 measurements).

The fix: carry those stages space-to-depth packed, [B, T, C] ->
[B, T/p, p*C] with p*C = 384 (phase-major: lane block m holds time phase m).
The reshape is layout-free in row-major logic and one relayout copy per
stage boundary on TPU. In the packed domain:

- dilated/plain convs become *packed convs*: y[p*s + r] = sum_j W[j] ·
  x[p*s + r + j*d - pad] regroups, with q = floor(e/p), m = e mod p, into a
  plain stride-1 conv over packed rows whose kernel W'[q, m*Cin:, r*Cout:]
  holds W[j] blocks (zeros elsewhere). The contraction dim grows from C to
  p*C = 384 — XLA tiles it onto the MXU instead of the VPU, and the
  activations carry zero lane padding.
- the anti-aliased snake activation gets a dedicated packed Pallas kernel
  (packed_snake_activation1d below): the up/down FIR time-shifts become
  lane-block rotations with row carry, computed at full 384-lane width.

Numerics are exact (same f32 sums, modulo reassociation); parity is tested
against the unpacked composition in tests/test_packed.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bigvgan import (downsample1d, kaiser_sinc_filter1d, snake,
                              snake_beta, upsample1d)


def pack_time(x: jax.Array, p: int) -> jax.Array:
    """[B, T, C] -> [B, T/p, p*C], phase-major (lane block m = time phase m)."""
    b, t, c = x.shape
    assert t % p == 0, (t, p)
    return x.reshape(b, t // p, p * c)


def unpack_time(xp: jax.Array, p: int) -> jax.Array:
    """[B, S, p*C] -> [B, S*p, C]."""
    b, s, pc = xp.shape
    assert pc % p == 0, (pc, p)
    return xp.reshape(b, s * p, pc // p)


# --- packed conv --------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _pack_conv_plan(k: int, pad: int, dilation: int, p: int):
    """Static scatter plan: one-hot O[j, r, q', m] mapping original tap j and
    output phase r to packed tap q' and input phase m."""
    e = np.arange(p)[None, :] + np.arange(k)[:, None] * dilation - pad  # [k, p] -> e(j, r)
    q = e // p
    m = e - q * p
    q_min, q_max = int(q.min()), int(q.max())
    nq = q_max - q_min + 1
    onehot = np.zeros((k, p, nq, p), np.float32)
    jj, rr = np.meshgrid(np.arange(k), np.arange(p), indexing="ij")
    onehot[jj, rr, q[jj, rr] - q_min, m[jj, rr]] = 1.0
    return onehot, -q_min, q_max


def pack_conv_kernel(w: jax.Array, pad: int, dilation: int, p: int):
    """W [k, Cin, Cout] -> (W' [Q, p*Cin, p*Cout], pad_lo, pad_hi) such that
    conv(pack(x), W', padding=(pad_lo, pad_hi)) == pack(conv(x, W, pad, dil))."""
    k, cin, cout = w.shape
    onehot, pad_lo, pad_hi = _pack_conv_plan(k, pad, dilation, p)
    nq = onehot.shape[2]
    wp = jnp.einsum("jrqm,jio->qmiro", jnp.asarray(onehot), w)
    return wp.reshape(nq, p * cin, p * cout), pad_lo, pad_hi


def packed_conv1d(xp: jax.Array, w: jax.Array, b: Optional[jax.Array], *,
                  pad: int, dilation: int, p: int,
                  conv_dtype=None) -> jax.Array:
    """Packed-domain conv: xp [B, S, p*Cin], w [k, Cin, Cout] (original layout),
    bias b [Cout]. Equals pack(conv1d(unpack(xp), w, b, padding=pad,
    dilation=dilation), p).

    ``conv_dtype=jnp.bfloat16`` runs the MXU contraction in bf16 with f32
    accumulation (weights + activations cast inside the conv; output f32).
    """
    if _is_int8(conv_dtype):
        raise ValueError(
            "int8 dots need per-channel scales — only the Pallas kernels "
            "(pallas_convs=True) support conv_dtype=int8")
    wp, pad_lo, pad_hi = pack_conv_kernel(w, pad, dilation, p)
    dt = conv_dtype or xp.dtype
    y = jax.lax.conv_general_dilated(
        xp.astype(dt), wp.astype(dt), (1,), [(pad_lo, pad_hi)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(xp.dtype)
    if b is not None:
        y = y + jnp.tile(b, p).astype(y.dtype)
    return y


# --- packed conv as a Pallas MXU kernel ---------------------------------------
#
# XLA's TPU lowering of these 1-D NHC convs picks T(1,128) output layouts and
# runs at 16-27 GB/s (profiled) — ~4x off the HBM roofline even for the wide
# stages. The Pallas kernel keeps everything T(8,128) and expresses the conv
# as a loop of [s_t, pC] @ [pC, c_blk] MXU dots over the *nonzero* packed
# taps (for p=1 and dilation d that is exactly the k original taps, not the
# (k-1)d+1 dense ones).


@functools.lru_cache(maxsize=256)
def _nonzero_taps(k: int, pad: int, dilation: int, p: int):
    """Offsets (relative packed-row shifts) of taps with any nonzero block."""
    onehot, pad_lo, pad_hi = _pack_conv_plan(k, pad, dilation, p)
    nz = np.flatnonzero(onehot.sum(axis=(0, 1, 3)) > 0)
    return tuple(int(q) - pad_lo for q in nz), tuple(int(q) for q in nz), pad_lo, pad_hi


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def pack_conv_kernel_nz(w: jax.Array, pad: int, dilation: int, p: int):
    """Nonzero-taps-only packed weights: (wnz [Qnz, p*Cin, p*Cout],
    rel_offsets, pad_lo, pad_hi). Equivalent to gathering the nonzero rows
    of pack_conv_kernel's output, but never materializes the dense
    [(k-1)*dilation+1, ...] tap tensor — at p=1 (where the packed weights
    ARE the original taps) it is a no-op view of ``w``. This runs inside
    the traced serving program on every call, so its cost is per-clip:
    the dense einsum showed up at ~2 ms/clip in end-to-end traces."""
    rel_offsets, nz_idx, pad_lo, pad_hi = _nonzero_taps(k := w.shape[0],
                                                        pad, dilation, p)
    if p == 1:
        return w, rel_offsets, pad_lo, pad_hi
    onehot, _, _ = _pack_conv_plan(k, pad, dilation, p)
    cin, cout = w.shape[1], w.shape[2]
    oh_nz = jnp.asarray(onehot[:, :, list(nz_idx), :])  # [k, p, Qnz, p]
    wnz = jnp.einsum("jrqm,jio->qmiro", oh_nz, w)
    return wnz.reshape(len(nz_idx), p * cin, p * cout), rel_offsets, pad_lo, pad_hi


# --- int8 quantized dots (opt-in via dot_dtype=jnp.int8) ----------------------
#
# The packed-conv dots run at ~MXU f32/bf16 peak (PERF.md round-4 conv
# calibration) and carry ~p x redundant FLOPs from the dense packed tap
# blocks; the v5e MXU's int8 path has 2x the MAC rate, so int8 dots are the
# one remaining way to cut the conv half of the fused-unit time. Scheme:
# per-output-lane weight scales folded at trace time (wq * s_w ~= w) +
# ONE dynamic scalar activation scale per kernel input window
# (aq * s_x ~= a), so the dequant factors completely out of the tap loop:
# y = s_x * (sum_q int32_dot(aq, wq)) * s_w — zero extra VPU work inside the
# MXU chain, ~3 VPU passes to quantize the window. Accuracy is bounded
# offline by the realistic-stats LSD battery (tests/test_lsd_battery.py).


def _is_int8(dt) -> bool:
    return dt is not None and jnp.dtype(dt) == jnp.int8


def _quant_weights_per_cout(wnz: jax.Array):
    """[Q, pcin, pcout] f32 -> (int8 weights, [pcout] f32 scales)."""
    amax = jnp.max(jnp.abs(wnz), axis=(0, 1))
    s_w = jnp.maximum(amax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(wnz / s_w), -127, 127).astype(jnp.int8)
    return wq, s_w


def _quant_tile(a: jax.Array):
    """f32 window -> (int8 window, scalar scale) with a ~= aq * s_x."""
    amax = jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
    aq = jnp.round(a * (127.0 / amax)).astype(jnp.int8)
    return aq, amax / 127.0


def _make_conv_kernel(offsets, s_t: int, p8: int, c_blk: int, dot_dtype,
                      n_res: int = 1, out_scale: float = 1.0,
                      n_tiles: int = 0):
    import jax.experimental.pallas as pl

    quant = _is_int8(dot_dtype)

    def kernel(cur_ref, prev_ref, nxt_ref, w_ref, b_ref, *rest):
        if quant:
            sw_ref, rest = rest[0], rest[1:]
        res_refs, out_ref = rest[:-1], rest[-1]
        pv, nx = prev_ref[0], nxt_ref[0]
        if n_tiles:  # neighbor-block halos: zero them at the sequence ends
            i = pl.program_id(2)
            pv = jnp.where(i > 0, pv, jnp.zeros_like(pv))
            nx = jnp.where(i < n_tiles - 1, nx, jnp.zeros_like(nx))
        ext = jnp.concatenate([pv, cur_ref[0], nx], axis=0)
        if quant:
            eq, s_x = _quant_tile(ext.astype(jnp.float32))
            acc_i = jnp.zeros((s_t, c_blk), jnp.int32)
            for qi, off in enumerate(offsets):
                acc_i = acc_i + jax.lax.dot_general(
                    eq[p8 + off : p8 + off + s_t, :], w_ref[qi],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            acc = acc_i.astype(jnp.float32) * (s_x * sw_ref[0, :])
        else:
            ext = ext.astype(dot_dtype)
            acc = jnp.zeros((s_t, c_blk), jnp.float32)
            for qi, off in enumerate(offsets):
                acc = acc + jax.lax.dot_general(
                    ext[p8 + off : p8 + off + s_t, :], w_ref[qi],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, :].astype(jnp.float32)
        for res_ref in res_refs:
            acc = acc + res_ref[0].astype(jnp.float32)
        if out_scale != 1.0:
            acc = acc * out_scale
        out_ref[0, :, :] = acc.astype(out_ref.dtype)

    return kernel


def _as_residual_tuple(residual) -> tuple:
    if residual is None:
        return ()
    if isinstance(residual, (list, tuple)):
        return tuple(residual)
    return (residual,)


def pallas_packed_conv1d(xp: jax.Array, w: jax.Array, b: Optional[jax.Array],
                         *, pad: int, dilation: int, p: int,
                         residual=None, out_scale: float = 1.0,
                         dot_dtype=jnp.float32,
                         interpret: bool = False) -> jax.Array:
    """Same contract as packed_conv1d (+ optional fused residual adds),
    computed by a Pallas kernel: per (cout-block, time-tile), Qnz MXU dots
    with f32 accumulation. ``dot_dtype`` is the MXU input precision (weights
    and activations are cast on the fly).

    ``residual`` may be one array or a sequence of arrays (all [B, S, pCout]),
    summed into the output in-kernel; ``out_scale`` multiplies the final sum —
    together they let a caller fold e.g. BigVGAN's MRF branch average
    ``(y1 + y2 + conv(x) + res) / 3`` into the last branch's conv instead of
    paying a separate full-array elementwise pass (reference takes the mean at
    bigvgan/models.py:187-191).
    """
    bsz, s, pcin = xp.shape
    k, cin, cout = w.shape
    assert pcin == p * cin, (xp.shape, w.shape, p)
    pcout = p * cout

    wnz, rel_offsets, pad_lo, pad_hi = pack_conv_kernel_nz(w, pad, dilation, p)
    if not _is_int8(dot_dtype):
        wnz = wnz.astype(dot_dtype)                   # [Qnz, pC, pCout]
    bias = b if b is None else jnp.tile(b, p)
    return _pallas_conv_rows(xp, wnz, rel_offsets, pad_lo, pad_hi, bias,
                             _as_residual_tuple(residual), out_scale,
                             dot_dtype, interpret, pcout)


def _pallas_conv_rows(xp, wnz, rel_offsets, pad_lo: int, pad_hi: int,
                      bias_vec, residuals: tuple, out_scale: float,
                      dot_dtype, interpret: bool, pcout: int) -> jax.Array:
    """Shared Pallas core: ``y[s] = scale * (sum_q x[s+q] @ W[q] + bias +
    sum(residuals))`` over packed rows, zero outside [0, S). Drives both the
    packed conv and the packed transposed conv (which differ only in their
    weight scatter plans)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"

    bsz, s, pcin = xp.shape
    bias = (bias_vec if bias_vec is not None
            else jnp.zeros((pcout,), jnp.float32)).reshape(1, pcout)

    p8 = max(8, _round8(pad_lo))  # Pallas blocks need nonzero rows
    n8 = max(8, _round8(pad_hi))

    s_t = _pick_rows(s, cap=256)
    if s_t == 0:  # zero-pad rows (= the conv's own zero padding) and slice
        s_pad = -(-max(64, s) // 8) * 8
        xq = jnp.pad(xp, ((0, 0), (0, s_pad - s), (0, 0)))
        rq = tuple(jnp.pad(r, ((0, 0), (0, s_pad - s), (0, 0)))
                   for r in residuals)
        return _pallas_conv_rows(
            xq, wnz, rel_offsets, pad_lo, pad_hi, bias_vec, rq, out_scale,
            dot_dtype, interpret, pcout)[:, :s, :]
    n_tiles = s // s_t

    # Halo rows [i*s_t - p8, i*s_t) and [(i+1)*s_t, (i+1)*s_t + n8): when
    # s_t is a multiple of the halo heights these are whole neighbor BLOCKS
    # of xp itself, indexed straight from the BlockSpec (clamped at the
    # sequence ends, zeroed in-kernel — the conv's zero padding). That
    # keeps the halo DMA inside the Pallas pipeline; the XLA gather+mask
    # strips this replaces cost ~0.08 ms per call at 240-row tiles
    # (measured) — several ms across the ~90 vocoder kernels.
    blocked = s_t % p8 == 0 and s_t % n8 == 0 and n_tiles > 1
    if blocked:
        prev = nxt = xp
        rp, rn = s_t // p8, s_t // n8
        prev_spec = lambda b_, j, i: (b_, jnp.maximum(i * rp - 1, 0), 0)
        nxt_spec = lambda b_, j, i: (
            b_, jnp.minimum((i + 1) * rn, s // n8 - 1), 0)
    else:  # gather fallback (awkward tile sizes / single tile)
        ip = np.arange(n_tiles)[:, None] * s_t - p8 + np.arange(p8)[None, :]
        inx = (np.arange(n_tiles)[:, None] + 1) * s_t + np.arange(n8)[None, :]
        mp = ((ip >= 0) & (ip < s)).reshape(-1, 1).astype(np.float32)
        mn = ((inx >= 0) & (inx < s)).reshape(-1, 1).astype(np.float32)
        prev = xp[:, np.clip(ip, 0, s - 1).reshape(-1), :] * jnp.asarray(mp)
        nxt = xp[:, np.clip(inx, 0, s - 1).reshape(-1), :] * jnp.asarray(mn)
        prev = prev.reshape(bsz, n_tiles * p8, pcin)
        nxt = nxt.reshape(bsz, n_tiles * n8, pcin)
        prev_spec = lambda b_, j, i: (b_, i, 0)
        nxt_spec = lambda b_, j, i: (b_, i, 0)

    # cout block: largest divisor of pcout whose weight block fits a VMEM
    # budget (double-buffered alongside the x/out blocks). The budget is
    # counted at f32 itemsize regardless of dot_dtype: letting bf16 weights
    # double c_blk busts the 16 MiB scoped-vmem limit at the wide p=1
    # stages (measured: [5000, 768] k7d3 bf16 picks c_blk=384 and OOMs at
    # 16.47 MiB), and block shapes f32 can't run are never worth it.
    c_blk = pcout
    for cand in (pcout, 512, 384, 256, 128):
        if cand <= pcout and pcout % cand == 0:
            c_blk = cand
            if len(rel_offsets) * pcin * cand * 4 <= 7 * 2**20:
                break
    n_cb = pcout // c_blk

    kernel = _make_conv_kernel(rel_offsets, s_t, p8, c_blk, dot_dtype,
                               n_res=len(residuals), out_scale=out_scale,
                               n_tiles=n_tiles if blocked else 0)
    in_specs = [
        pl.BlockSpec((1, s_t, pcin), lambda b_, j, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p8, pcin), prev_spec, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n8, pcin), nxt_spec, memory_space=pltpu.VMEM),
        pl.BlockSpec((len(rel_offsets), pcin, c_blk),
                     lambda b_, j, i: (0, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_blk), lambda b_, j, i: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, prev, nxt, wnz, bias]
    if _is_int8(dot_dtype):
        wq, s_w = _quant_weights_per_cout(wnz.astype(jnp.float32))
        args[3] = wq
        in_specs.append(pl.BlockSpec((1, c_blk), lambda b_, j, i: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(s_w.reshape(1, pcout))
    for r in residuals:
        in_specs.append(pl.BlockSpec((1, s_t, c_blk),
                                     lambda b_, j, i: (b_, i, j),
                                     memory_space=pltpu.VMEM))
        args.append(r)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, s, pcout), xp.dtype),
        grid=(bsz, n_cb, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s_t, c_blk), lambda b_, j, i: (b_, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return y


# --- packed transposed conv (stage-boundary upsamplers) ------------------------
#
# BigVGAN's stage-boundary ConvTranspose1d upsamplers (reference:
# bigvgan/models.py:137-147) run between packed MRF stages. XLA's
# lhs_dilation lowering of these long-signal fractionally-strided convs is
# slow (PERF.md finding 1); instead the transposed conv is expressed in the
# packed domain directly. Group g_i input packed rows / g_o output packed
# rows into "super-rows" with g_o / g_i = u * p_in / p_out: the transposed
# conv becomes a plain stride-1 conv over super-rows,
#
#   out_super[s] = sum_q in_super[s + q] @ W''[q],
#
# with W'' [Q, g_i*p_in*Cin, g_o*p_out*Cout] holding W[j] blocks at the
# (input phase mu, output phase rho) positions where (rho + pad - j) % u == 0
# — the exact same Pallas core as the packed conv, just a different weight
# scatter plan. The super-row reshapes on either side are row-major no-ops.


@functools.lru_cache(maxsize=64)
def _convt_plan(k: int, u: int, pad: int, G_i: int, G_o: int):
    """One-hot scatter O[j, rho, q, mu] for the transposed conv: output
    sample rho of a super-row takes tap j from input sample mu of super-row
    (s + q) when (rho + pad - j) is a multiple of the stride u."""
    assert G_o == u * G_i, (G_o, u, G_i)
    entries = []
    for j in range(k):
        for rho in range(G_o):
            e = rho + pad - j
            if e % u == 0:
                t_rel = e // u
                q = t_rel // G_i
                entries.append((j, rho, q, t_rel - q * G_i))
    q_min = min(q for _, _, q, _ in entries)
    q_max = max(q for _, _, q, _ in entries)
    nq = q_max - q_min + 1
    onehot = np.zeros((k, G_o, nq, G_i), np.float32)
    for j, rho, q, mu in entries:
        onehot[j, rho, q - q_min, mu] = 1.0
    return onehot, -q_min, q_max


def pack_convt_kernel(wt: jax.Array, *, stride: int, padding: int,
                      p_in: int, p_out: int):
    """wt [K, Cout, Cin] (ConvTranspose orientation, as BigVGAN stores it) ->
    (W'' [Q, G_i*Cin, G_o*Cout], pad_lo, pad_hi, g_i, g_o) for the super-row
    plan. Requires u * p_in * Cin-divisibility only in row counts (checked by
    the caller)."""
    k, cout, cin = wt.shape
    # g_o / g_i = u * p_in / p_out in lowest terms
    num, den = stride * p_in, p_out
    g = math.gcd(num, den)
    g_o, g_i = num // g, den // g
    G_i, G_o = g_i * p_in, g_o * p_out
    onehot, pad_lo, pad_hi = _convt_plan(k, stride, padding, G_i, G_o)
    nq = onehot.shape[2]
    wp = jnp.einsum("jrqm,joi->qmiro", jnp.asarray(onehot), wt)
    return wp.reshape(nq, G_i * cin, G_o * cout), pad_lo, pad_hi, g_i, g_o


def pallas_packed_conv_transpose1d(xp: jax.Array, wt: jax.Array,
                                   b: Optional[jax.Array], *, stride: int,
                                   padding: int, p_in: int, p_out: int,
                                   residual=None, out_scale: float = 1.0,
                                   dot_dtype=jnp.float32,
                                   interpret: bool = False) -> jax.Array:
    """Packed-domain ConvTranspose1d: xp [B, S_in, p_in*Cin] (p_in may be 1),
    wt [K, Cout, Cin]; returns [B, S_out, p_out*Cout] with
    S_out = S_in * stride * p_in / p_out. Equals
    pack(conv_transpose1d(unpack(xp, p_in), wt, b, stride, padding), p_out)
    for the exact-length case (stride*T_in outputs — all of BigVGAN's
    upsamplers). ``residual``/``out_scale`` fold trailing elementwise work
    (e.g. the MRF average of the NEXT stage's input) into the kernel."""
    bsz, s_in, pcin = xp.shape
    k, cout, cin = wt.shape
    assert pcin == p_in * cin, (xp.shape, wt.shape, p_in)
    # torch ConvTranspose1d length: (T-1)*u - 2*pad + k; the packed plan
    # produces exactly u*T outputs — require the config to agree
    t_in = s_in * p_in
    t_out = (t_in - 1) * stride - 2 * padding + k
    assert t_out == stride * t_in, (
        "packed transposed conv requires (T-1)*u - 2*pad + k == u*T; "
        f"got u={stride} pad={padding} k={k}")

    # super-row geometry + nonzero taps only (the dense scatter would
    # materialize an [nq, G_i*Cin, G_o*Cout] tensor per call)
    num, den = stride * p_in, p_out
    g = math.gcd(num, den)
    g_o, g_i = num // g, den // g
    G_i, G_o = g_i * p_in, g_o * p_out
    onehot, pad_lo, pad_hi = _convt_plan(k, stride, padding, G_i, G_o)
    nz = np.flatnonzero(onehot.sum(axis=(0, 1, 3)) > 0)
    oh_nz = jnp.asarray(onehot[:, :, nz, :])  # [k, G_o, Qnz, G_i]
    wnz = jnp.einsum("jrqm,joi->qmiro", oh_nz, wt)
    wnz = wnz.reshape(len(nz), G_i * cin, G_o * cout)
    offsets = tuple(int(q) - pad_lo for q in nz)
    assert s_in % g_i == 0, (s_in, g_i)
    n_super = s_in // g_i
    s_out = n_super * g_o

    xs = xp.reshape(bsz, n_super, g_i * pcin)
    residuals = tuple(
        r.reshape(bsz, n_super, g_o * p_out * cout)
        for r in _as_residual_tuple(residual))
    bias = b if b is None else jnp.tile(b, g_o * p_out)
    if not _is_int8(dot_dtype):
        wnz = wnz.astype(dot_dtype)
    y = _pallas_conv_rows(xs, wnz, offsets,
                          pad_lo, pad_hi, bias, residuals, out_scale,
                          dot_dtype, interpret, g_o * p_out * cout)
    return y.reshape(bsz, s_out, p_out * cout)


# --- packed anti-aliased snake activation (Pallas) ----------------------------
#
# Sequence-edge semantics are handled IN-KERNEL (round 3): the reference's
# alias-free chain replicate-pads the base-rate signal before the up-FIR and
# the 2x-rate snake output before the down-FIR (models/bigvgan.py:128-165).
# With phase-major packing a sample-level clip to [0, T) aligns to whole
# packed rows, so exact replicate semantics are two row-indexed selects per
# array: rows < 0 read a lane-broadcast of unpacked sample 0 (phase 0 of the
# first valid row) and rows >= s_true read one of sample T-1 (phase p-1 of
# the last valid row). The broadcast source rows are fetched with clamped
# dynamic indices — they are in-window exactly for the tiles whose selects
# can fire. This replaced the old XLA-side `_patch_edges_*` subgraphs (~90
# per clip, several ms of glue + serial patch latency) at a cost of a few
# VPU selects per tile.

_H = 8  # halo rows each side (sublane-aligned; logical need is <= 5 rows)


def _act_filters():
    h = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float32)
    return h, 2.0 * h[0::2], 2.0 * h[1::2]


def _reference_act(x, alpha, beta, logscale):
    u = upsample1d(x, 2, 12)
    if beta is not None:
        s = snake_beta(u, alpha, beta, logscale)
    else:
        s = snake(u, alpha, logscale)
    return downsample1d(s, 2, 12)


def _snake_packed(u, alpha, beta):
    # alpha/beta pre-exp'd, tiled to p*C lanes; cos form + polynomial cos
    # (ops/fused_act.py:fast_cos — ~8x cheaper than Mosaic's builtin)
    from .fused_act import fast_cos
    half_inv_b = 0.5 / (beta + 1e-9)
    return u + half_inv_b - half_inv_b * fast_cos(u * (2.0 * alpha))


def _lane_broadcast(row, m0: int, p: int, c: int):
    """[1, pc] row -> [1, pc] with lane block ``m0`` (one unpacked sample's
    channels) tiled to all p phase blocks."""
    from jax.experimental.pallas import tpu as pltpu

    if p == 1:
        return row
    pc = p * c
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    masked = jnp.where((lane >= m0 * c) & (lane < (m0 + 1) * c), row, 0.0)
    acc = masked
    for m in range(p):
        if m != m0:
            acc = acc + pltpu.roll(masked, ((m - m0) * c) % pc, 1)
    return acc


def _dyn_row(arr, idx):
    """arr[idx : idx+1, :] with a traced row index; zeros when out of range.

    Mosaic has no dynamic_slice on values — a masked row-reduce is the
    supported idiom. Callers only consume the result in tiles where ``idx``
    is in-window, so the out-of-range zeros are never observed."""
    rows = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    return jnp.sum(jnp.where(rows == idx, arr, 0.0), axis=0, keepdims=True)


def _replicate_rows(arr, base_abs, s_true: int, p: int, c: int,
                    bc_lo=None, bc_hi=None):
    """Substitute rows of ``arr`` (abs packed row of row 0 = ``base_abs``, a
    traced scalar) that fall outside [0, s_true): rows < 0 become
    ``bc_lo`` (default: lane-broadcast of arr's own row at abs 0, phase 0)
    and rows >= s_true become ``bc_hi`` (default: broadcast of the row at
    abs s_true-1, phase p-1) — the packed form of sample-level replicate
    clipping."""
    n = arr.shape[0]
    if bc_lo is None:
        bc_lo = _lane_broadcast(_dyn_row(arr, -base_abs), 0, p, c)
    if bc_hi is None:
        bc_hi = _lane_broadcast(_dyn_row(arr, s_true - 1 - base_abs),
                                p - 1, p, c)
    rows = base_abs + jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    return jnp.where(rows < 0, bc_lo, jnp.where(rows >= s_true, bc_hi, arr))


def _lane_shifter(arr, base: int, p: int, c: int):
    """Unpacked-sample shifts over ``arr`` (packed rows from ``base``):
    ush(delta, row0, n)[s, m*c:] = unpacked[p*(row0+s) + m + delta].

    Mosaic can't lane-concat slices with mismatched sublane offsets, so
    each distinct lane shift is one cached full-array circular roll; the
    wrapped lanes are then taken from the next row via a lane-index
    select. Shared by the standalone act kernel and the fused act->conv
    kernel — keep ALL shift-logic changes here.
    """
    from jax.experimental.pallas import tpu as pltpu

    pc = p * c
    cache = {}

    def rolled(rm: int):
        if rm not in cache:
            cache[rm] = pltpu.roll(arr, pc - c * rm, 1)
        return cache[rm]

    def ush(delta: int, row0: int, n: int):
        q, rm = divmod(delta, p)
        i0 = row0 + q - base
        if rm == 0:
            return arr[i0 : i0 + n, :]
        r = rolled(rm)
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, pc), 1)
        return jnp.where(lane < pc - c * rm, r[i0 : i0 + n, :],
                         r[i0 + 1 : i0 + 1 + n, :])

    return ush


def _act_rows(ext, ext_base: int, alpha, beta, p: int, c: int,
              row_lo: int, n_rows: int, tile_start=None,
              s_true: Optional[int] = None, ush_x=None):
    """Anti-aliased snake over packed act rows [row_lo, row_lo + n_rows)
    given the f32 input window ``ext`` whose row 0 is packed row
    ``ext_base``. The in-VMEM act body shared by all three Pallas kernels:
    up-FIR (se/so phases) -> snake -> down-FIR.

    ``tile_start`` (traced scalar: absolute packed row of local row 0) +
    ``s_true`` enable exact sequence-edge semantics: the down-FIR reads the
    2x-rate snake signal with sample indices clipped to [0, 2T) (the
    reference's replicate padding, models/bigvgan.py:149-164) — any clipped
    negative index lands on 2x-sample 0 (= se phase 0 of abs row 0) and any
    past-the-end index on 2x-sample 2T-1 (= so phase p-1 of abs row
    s_true-1). The caller is responsible for replicate-substituting ``ext``
    itself (the up-FIR side).

    ``ush_x`` optionally shares a prebuilt ``_lane_shifter(ext, ext_base,
    p, c)`` across calls — its full-array roll cache is the dominant
    non-snake VPU act cost, so subtile-pipelined callers pass one."""
    h, we, wo = _act_filters()
    pc = p * c
    # se/so row window: every down-FIR tap m in [-3, 3] reads packed row
    # floor(m/p) (+1 when the lane shift wraps), so +-ceil(3/p) rows suffice:
    # +-3 at p=1 (pure row shifts), +-2 at p=2, +-1 at p>=4. Stays within the
    # callers' _H=8 input halo for all p (x accesses reach +-2*ceil(3/p)).
    e = -(-3 // p)
    n_s = n_rows + 2 * e
    if ush_x is None:
        ush_x = _lane_shifter(ext, ext_base, p, c)
    se = jnp.zeros((n_s, pc), jnp.float32)
    so = jnp.zeros((n_s, pc), jnp.float32)
    for d in range(-3, 4):  # build each shift once, MAC, let it die
        sh = ush_x(d, row_lo - e, n_s)
        if -3 <= d <= 2:
            se = se + we[d + 3] * sh
        if -2 <= d <= 3:
            so = so + wo[d + 2] * sh
    se = _snake_packed(se, alpha, beta)
    so = _snake_packed(so, alpha, beta)

    if tile_start is not None:
        abs0 = tile_start + (row_lo - e)
        bc_lo = _lane_broadcast(_dyn_row(se, -abs0), 0, p, c)
        bc_hi = _lane_broadcast(_dyn_row(so, s_true - 1 - abs0), p - 1, p, c)
        se = _replicate_rows(se, abs0, s_true, p, c, bc_lo, bc_hi)
        so = _replicate_rows(so, abs0, s_true, p, c, bc_lo, bc_hi)

    ush_se = _lane_shifter(se, row_lo - e, p, c)
    ush_so = _lane_shifter(so, row_lo - e, p, c)
    y = jnp.zeros((n_rows, pc), jnp.float32)
    for m in range(-2, 4):
        y = y + h[2 * m + 5] * ush_se(m, row_lo, n_rows)
    for m in range(-3, 3):
        y = y + h[2 * m + 6] * ush_so(m, row_lo, n_rows)
    return y


def _make_packed_kernel(s_t: int, p: int, c: int, s_true: int):
    import jax.experimental.pallas as pl

    def kernel(cur_ref, prev_ref, nxt_ref, ab_ref, out_ref):
        i = pl.program_id(1)
        tile_start = i * s_t
        ext = jnp.concatenate(
            [prev_ref[0].astype(jnp.float32),
             cur_ref[0].astype(jnp.float32),
             nxt_ref[0].astype(jnp.float32)], axis=0)  # rows -H .. s_t+H

        # Edge tiles (the ones whose window can reach outside [0, s_true))
        # take the replicate-substitution path; interior tiles — all but ~2
        # per call — skip every substitution pass.
        is_edge = (i == 0) | (tile_start + s_t + _H > s_true)

        @pl.when(is_edge)
        def _():
            # up-FIR side of the reference's replicate padding: x samples
            # outside [0, T) read the clipped edge samples
            e2 = _replicate_rows(ext, tile_start - _H, s_true, p, c)
            y = _act_rows(e2, -_H, ab_ref[0, :], ab_ref[1, :], p, c, 0, s_t,
                          tile_start, s_true)
            out_ref[0, :, :] = y.astype(out_ref.dtype)

        @pl.when(jnp.logical_not(is_edge))
        def _():
            y = _act_rows(ext, -_H, ab_ref[0, :], ab_ref[1, :], p, c, 0, s_t)
            out_ref[0, :, :] = y.astype(out_ref.dtype)

    return kernel


def _pick_rows(s: int, cap: int = 512) -> int:
    """Largest multiple-of-8 divisor of s up to cap; 0 if none."""
    for cand in range(min(cap, s), 7, -8):
        if s % cand == 0:
            return cand
    return 0


def packed_snake_activation1d(xp: jax.Array, alpha: jax.Array,
                              beta: Optional[jax.Array], logscale: bool,
                              p: int, interpret: bool = False) -> jax.Array:
    """Fused 2x-up -> snake(beta) -> 2x-down on a packed feature map.

    xp: [B, S, p*C]; alpha/beta: [C]. Equals
    pack(downsample2(snake(upsample2(unpack(xp)))), p) — the unfused
    composition of models/bigvgan.py:128-177 — to f32 reassociation,
    including the sequence-edge replicate semantics (handled in-kernel).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"

    bsz, s, pc = xp.shape
    c = pc // p
    a = jnp.exp(alpha) if logscale else alpha
    bb = (jnp.exp(beta) if logscale else beta) if beta is not None else a
    ab = jnp.stack([jnp.tile(a, p), jnp.tile(bb, p)]).astype(jnp.float32)

    s_t = _pick_rows(s)
    s_true = s
    if s_t == 0:  # pad rows (content irrelevant — in-kernel edge handling
        # reads by TRUE row index) and slice back
        s_pad = -(-max(64, s) // 8) * 8
        xq = jnp.pad(xp, ((0, 0), (0, s_pad - s), (0, 0)))
        return _packed_act_core(xq, s, alpha, beta, logscale, p, ab,
                                interpret)[:, :s, :]
    return _packed_act_core(xp, s_true, alpha, beta, logscale, p, ab,
                            interpret)


def _packed_act_core(xp, s_true, alpha, beta, logscale, p, ab, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, s, pc = xp.shape
    c = pc // p
    s_t = _pick_rows(s)
    n_tiles = s // s_t

    # Halo rows come from xp itself as neighbor blocks of height _H (s_t is
    # always a multiple of _H=8), clamped at the sequence ends — no XLA-side
    # gather strips. The kernel substitutes any halo/pad row outside
    # [0, s_true) with the replicate-clipped edge content itself.
    r_h = s_t // _H
    return pl.pallas_call(
        _make_packed_kernel(s_t, p, c, s_true),
        out_shape=jax.ShapeDtypeStruct((bsz, s, pc), xp.dtype),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, s_t, pc), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _H, pc),
                         lambda b, i: (b, jnp.maximum(i * r_h - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _H, pc),
                         lambda b, i: (b, jnp.minimum((i + 1) * r_h,
                                                      s // _H - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, pc), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_t, pc), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, xp, xp, ab)


def packed_act_reference(xp: jax.Array, alpha: jax.Array,
                         beta: Optional[jax.Array], logscale: bool,
                         p: int) -> jax.Array:
    """Unfused XLA composition on the packed layout (unpack -> act -> pack);
    ground truth for the kernel and the differentiable fallback."""
    return pack_time(_reference_act(unpack_time(xp, p), alpha, beta, logscale), p)


# --- fused act -> conv (one kernel per [act, conv] pair) -----------------------
#
# AMPBlock1 is a chain of [act -> conv] pairs (reference: bigvgan/models.py:
# 63-71). Running them as separate kernels round-trips the act output through
# HBM; with the polynomial-cos snake the act is bandwidth/shift-bound, so
# fusing the act into the conv kernel's prologue (act computed in VMEM over
# the conv's input window, then the MXU dots) removes one full feature-map
# write+read per pair. Eligible when the packed conv weights for ALL output
# lanes fit VMEM alongside the act working set (single cout block) — true for
# every AMPBlock conv except the widest-dilation cases at small p, which fall
# back to the unfused pair.

def _make_act_conv_kernel(s_t: int, p: int, c: int, cout: int, s_true: int,
                          rel_offsets, hl8: int, hr8: int, pad_lo: int,
                          pad_hi: int, dot_dtype, n_res: int,
                          out_scale: float = 1.0, pipeline: int = 1):
    import jax.experimental.pallas as pl

    pc = p * c
    pcout = p * cout
    act_lo = -pad_lo
    n_a = s_t + pad_lo + pad_hi
    sh = s_t // pipeline  # subtile rows (pipeline > 1: VPU/MXU interleave)
    quant = _is_int8(dot_dtype)

    def kernel(cur_ref, prev_ref, nxt_ref, ab_ref, w_ref, b_ref, *rest):
        if quant:
            sw_ref, rest = rest[0], rest[1:]
        res_refs, out_ref = rest[:-1], rest[-1]
        i = pl.program_id(1)
        tile_start = i * s_t
        ext = jnp.concatenate(
            [prev_ref[0].astype(jnp.float32),
             cur_ref[0].astype(jnp.float32),
             nxt_ref[0].astype(jnp.float32)], axis=0)  # rows -hl8 .. s_t+hr8

        def conv(a, row0: int, n: int):
            # ``a`` is the f32 act window; int8 mode quantizes it here with
            # one scalar scale so the dequant factors out of the tap loop
            if quant:
                aq, s_x = _quant_tile(a)
                acc_i = jnp.zeros((n, pcout), jnp.int32)
                for qi, off in enumerate(rel_offsets):
                    acc_i = acc_i + jax.lax.dot_general(
                        aq[off + pad_lo : off + pad_lo + n, :], w_ref[qi],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                acc = acc_i.astype(jnp.float32) * (s_x * sw_ref[0, :])
            else:
                a = a.astype(dot_dtype)
                acc = jnp.zeros((n, pcout), jnp.float32)
                for qi, off in enumerate(rel_offsets):
                    acc = acc + jax.lax.dot_general(
                        a[off + pad_lo : off + pad_lo + n, :], w_ref[qi],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = acc + b_ref[0, :].astype(jnp.float32)
            for res_ref in res_refs:
                acc = acc + res_ref[0, row0 : row0 + n].astype(jnp.float32)
            if out_scale != 1.0:
                acc = acc * out_scale
            return acc

        def finish(a):
            out_ref[0, :, :] = conv(a, 0, s_t).astype(out_ref.dtype)

        is_edge = (i == 0) | (tile_start + s_t + hr8 > s_true)

        @pl.when(is_edge)
        def _():
            e2 = _replicate_rows(ext, tile_start - hl8, s_true, p, c)
            # anti-aliased snake over act rows [act_lo, act_lo + n_a) —
            # shared body with the standalone act kernel, edge-exact
            a = _act_rows(e2, -hl8, ab_ref[0, :], ab_ref[1, :], p, c,
                          act_lo, n_a, tile_start, s_true)
            # conv zero padding: act rows outside [0, s_true) are zero
            grow = tile_start + act_lo + jax.lax.broadcasted_iota(
                jnp.int32, (n_a, pc), 0)
            a = jnp.where((grow >= 0) & (grow < s_true), a, 0.0)
            finish(a)

        @pl.when(jnp.logical_not(is_edge))
        def _():
            if pipeline <= 1:
                a = _act_rows(ext, -hl8, ab_ref[0, :], ab_ref[1, :], p, c,
                              act_lo, n_a)
                finish(a)
                return
            # Subtile software pipeline (see _make_amp_unit_kernel): emit
            # the next subtile's act (VPU) between this subtile's conv dots
            # (MXU) so the engines can dual-issue.
            ush_x = _lane_shifter(ext, -hl8, p, c)
            n_a_q = sh + pad_lo + pad_hi

            def act_q(q):
                return _act_rows(ext, -hl8, ab_ref[0, :], ab_ref[1, :],
                                 p, c, q * sh - pad_lo, n_a_q, ush_x=ush_x)

            a_next = act_q(0)
            for q in range(pipeline):
                a_cur = a_next
                if q + 1 < pipeline:
                    a_next = act_q(q + 1)                       # VPU
                o_q = conv(a_cur, q * sh, sh)                    # MXU
                out_ref[0, q * sh : (q + 1) * sh, :] = o_q.astype(out_ref.dtype)

    return kernel


def act_conv_plan(k: int, pad: int, dilation: int, p: int, c: int) -> int:
    """Time-tile cap for the fused act->conv kernel, 0 = not fusable.

    The kernel's VMEM footprint is weights (full-cout block, resident) +
    the act working set (ext window + up to six cached lane-rolls of
    ext/se/so + the act output + out/residual blocks), and the act set
    scales with the time tile. Pairs whose weights fit 6 MiB run at the
    measured-optimal cap 256; heavier pairs up to 12 MiB still win fused
    at cap 128 (stage-2/3 k=11: +0.65/+1.46 ms/pair measured) — the saved
    full-array act round-trip outweighs the extra per-tile act halo
    recompute — EXCEPT at 768-lane widths (stage-1 k=3, 6.8 MiB), where
    the fused pair measured 0.52 ms/pair SLOWER than act+conv (round-3
    sweep, PERF.md): the double-width act working set at a 128-row tile
    starves the pipeline. Beyond 12 MiB (stage-1 k=7/11) nothing fits.
    p=1 is fusable too: there every act shift is a pure row slice."""
    rel_offsets, _, _, _ = _nonzero_taps(k, pad, dilation, p)
    wbytes = len(rel_offsets) * (p * c) * (p * c) * 4
    if wbytes <= 6 * 2**20:
        return 256
    if wbytes <= 12 * 2**20 and p * c <= 384:
        return 128
    return 0


def act_conv_fusable(k: int, pad: int, dilation: int, p: int, c: int) -> bool:
    """True when the fused act->conv kernel fits VMEM (see act_conv_plan)."""
    return act_conv_plan(k, pad, dilation, p, c) > 0


def pallas_packed_act_conv1d(xp: jax.Array, alpha: jax.Array,
                             beta: Optional[jax.Array], logscale: bool,
                             w: jax.Array, b: Optional[jax.Array], *,
                             pad: int, dilation: int, p: int,
                             residual=None, out_scale: float = 1.0,
                             dot_dtype=jnp.float32,
                             interpret: bool = False,
                             s_t_cap: int = 256,
                             pipeline: int = 1) -> jax.Array:
    """One kernel computing ``out_scale * (conv(act(xp)) + sum(residuals))``:
    equals pallas_packed_conv1d(packed_snake_activation1d(xp, ...), w, b,
    ...) with the intermediate kept in VMEM. ``residual`` may be one array
    or a sequence (all [B, S, pCout]) — with ``out_scale`` this lets the MRF
    branch average fold into the last branch's fused pair exactly like the
    bare conv kernel. Sequence-edge replicate semantics are exact in-kernel
    (see the act section header). ``s_t_cap`` bounds the time-tile rows —
    the kernel's VMEM working set (weights + act arrays + cached lane
    rolls) scales with it, and smaller tiles can pipeline better."""
    interpret = interpret or jax.default_backend() != "tpu"
    bsz, s, pcin = xp.shape
    k, cin, cout = w.shape
    assert pcin == p * cin and cin == cout, (xp.shape, w.shape, p)
    residuals = _as_residual_tuple(residual)

    s_t = _pick_rows(s, cap=s_t_cap)
    if s_t == 0:  # pad rows; the kernel masks by the TRUE length
        s_pad = -(-max(64, s) // 8) * 8
        xq = jnp.pad(xp, ((0, 0), (0, s_pad - s), (0, 0)))
        rq = tuple(jnp.pad(r, ((0, 0), (0, s_pad - s), (0, 0)))
                   for r in residuals)
        return _act_conv_padded(xq, s, alpha, beta, logscale, w, b, pad,
                                dilation, p, rq, out_scale, dot_dtype,
                                interpret, s_t_cap, pipeline)[:, :s, :]
    return _act_conv_core(xp, s, s_t, alpha, beta, logscale, w, b, pad,
                          dilation, p, residuals, out_scale, dot_dtype,
                          interpret, pipeline)


def _act_conv_padded(xq, s_true, alpha, beta, logscale, w, b, pad, dilation,
                     p, residuals, out_scale, dot_dtype, interpret,
                     s_t_cap: int = 256, pipeline: int = 1):
    s_pad = xq.shape[1]
    s_t = _pick_rows(s_pad, cap=s_t_cap)
    return _act_conv_core(xq, s_true, s_t, alpha, beta, logscale, w, b, pad,
                          dilation, p, residuals, out_scale, dot_dtype,
                          interpret, pipeline)


def _act_conv_core(xp, s_true, s_t, alpha, beta, logscale, w, b, pad,
                   dilation, p, residuals, out_scale, dot_dtype, interpret,
                   pipeline: int = 1):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, s, pcin = xp.shape
    k, cin, cout = w.shape
    pc, pcout = p * cin, p * cout
    n_tiles = s // s_t
    wnz, rel_offsets, pad_lo, pad_hi = pack_conv_kernel_nz(w, pad, dilation, p)
    w_scale = None
    if _is_int8(dot_dtype):
        wnz, w_scale = _quant_weights_per_cout(wnz.astype(jnp.float32))
    else:
        wnz = wnz.astype(dot_dtype)
    # the act body reads x rows up to 2*ceil(3/p) beyond the conv's own
    # [pad_lo, pad_hi] reach (see _act_rows): +-6 at p=1, +-4 at p=2, +-2
    # at p>=4
    e2 = 2 * -(-3 // p)
    hl8 = _round8(pad_lo + e2)
    hr8 = _round8(pad_hi + e2)
    bias = (jnp.tile(b, p) if b is not None
            else jnp.zeros((pcout,), jnp.float32)).reshape(1, pcout)
    a_ = jnp.exp(alpha) if logscale else alpha
    bb = (jnp.exp(beta) if logscale else beta) if beta is not None else a_
    ab = jnp.stack([jnp.tile(a_, p), jnp.tile(bb, p)]).astype(jnp.float32)

    # Halo rows as neighbor blocks of xp when the tile height divides into
    # them (whatever the clamped edge blocks carry, the kernel substitutes
    # every row outside [0, s_true) with replicate-clipped edge content and
    # zero-masks act rows for the conv's own zero padding); XLA gather
    # strips only as a fallback.
    blocked = s_t % hl8 == 0 and s_t % hr8 == 0 and n_tiles > 1
    if blocked:
        prev = nxt = xp
        rp, rn = s_t // hl8, s_t // hr8
        prev_spec = lambda b_, i: (b_, jnp.maximum(i * rp - 1, 0), 0)
        nxt_spec = lambda b_, i: (
            b_, jnp.minimum((i + 1) * rn, s // hr8 - 1), 0)
    else:
        ip = np.clip(np.arange(n_tiles)[:, None] * s_t - hl8
                     + np.arange(hl8)[None, :], 0, s - 1).reshape(-1)
        inx = np.clip((np.arange(n_tiles)[:, None] + 1) * s_t
                      + np.arange(hr8)[None, :], 0, s - 1).reshape(-1)
        prev = xp[:, ip, :].reshape(bsz, n_tiles * hl8, pcin)
        nxt = xp[:, inx, :].reshape(bsz, n_tiles * hr8, pcin)
        prev_spec = lambda b_, i: (b_, i, 0)
        nxt_spec = lambda b_, i: (b_, i, 0)

    if pipeline > 1 and s_t % (8 * pipeline) != 0:
        pipeline = 1  # subtiles must stay sublane-aligned
    kernel = _make_act_conv_kernel(
        s_t, p, cin, cout, s_true, rel_offsets, hl8, hr8, pad_lo, pad_hi,
        dot_dtype, len(residuals), out_scale, pipeline)
    in_specs = [
        pl.BlockSpec((1, s_t, pcin), lambda b_, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hl8, pcin), prev_spec, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hr8, pcin), nxt_spec, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, pcin), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((len(rel_offsets), pcin, pcout),
                     lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pcout), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, prev, nxt, ab, wnz, bias]
    if w_scale is not None:
        in_specs.append(pl.BlockSpec((1, pcout), lambda b_, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w_scale.reshape(1, pcout))
    for r in residuals:
        in_specs.append(pl.BlockSpec((1, s_t, pcout),
                                     lambda b_, i: (b_, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(r)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, s, pcout), xp.dtype),
        grid=(bsz, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s_t, pcout), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


# --- fused AMP unit: act -> conv -> act -> conv (+residual) in ONE kernel ------
#
# Each AMPBlock1 dilation unit is the chain x -> act1 -> conv1(k, d) -> act2
# -> conv2(k, 1) -> (+x [+extras]) * scale (reference: bigvgan/models.py:
# 63-71). Fusing the whole unit keeps BOTH intermediates (act1 output and
# conv1 output) in VMEM — one more full feature-map HBM round-trip saved per
# unit on top of the act->conv pair fusion — and the unit's own residual is
# the kernel's input block, so it costs no extra HBM read. Numerics are the
# exact same f32 dots and act math as the two fused pairs it replaces.


def _unit_geometry(k1: int, pad1: int, dil1: int, k2: int, pad2: int,
                   dil2: int, p: int):
    off1, _, pl1, ph1 = _nonzero_taps(k1, pad1, dil1, p)
    off2, _, pl2, ph2 = _nonzero_taps(k2, pad2, dil2, p)
    e2 = 2 * -(-3 // p)  # act x-reach in packed rows (see _act_rows)
    hl8 = _round8(pl1 + pl2 + 2 * e2)
    hr8 = _round8(ph1 + ph2 + 2 * e2)
    return off1, pl1, ph1, off2, pl2, ph2, e2, hl8, hr8


def amp_unit_plan(k: int, dil1: int, p: int, c: int) -> int:
    """Time-tile cap for the fused AMP-unit kernel, 0 = not fusable.

    Both convs' full-cout weight blocks must sit in VMEM alongside two act
    working sets and the conv1 intermediate. Rules from the round-3 TPU cap
    sweep (scripts/bench_amp_unit.py, PERF.md): the unit beats two fused
    pairs ONLY where packing does not inflate conv1's tap count
    (at p=2 with d∈{3,5} the packed rewrite carries 11/17 taps for k=7/11
    and the in-kernel MXU work swamps the saved HBM round-trip — measured
    -0.3..-0.7 ms/unit) and the resident weights stay ≤8 MiB. The round-4
    in-program trace A/B (scripts/compare_trace_plans.py, PERF.md round-4)
    tightened the tap bound to ``n1 <= 7``: the two eligible-by-``n1<=k``
    units with n1=9 (k=11 d=3 p=4 and k=11 d=5 p=8) each ran ~2.5 ms
    SLOWER as units than as two pairs (5.4/5.8 vs 2.9/3.1 ms), while every
    n1<=7 unit won by +0.02..+0.14 ms. Within the eligible set, bigger
    time tiles always measured faster (128 < 256 < 512), so eligible units
    run at cap 512."""
    pad1 = (k * dil1 - dil1) // 2
    pad2 = (k - 1) // 2
    n1 = len(_nonzero_taps(k, pad1, dil1, p)[0])
    n2 = len(_nonzero_taps(k, pad2, 1, p)[0])
    wbytes = (n1 + n2) * (p * c) * (p * c) * 4
    if n1 <= 7 and wbytes <= 8 * 2**20:
        return 512
    return 0


def _make_amp_unit_kernel(s_t: int, p: int, c: int, s_true: int,
                          off1, pl1: int, ph1: int, off2, pl2: int,
                          ph2: int, e2: int, hl8: int, hr8: int, dot_dtype,
                          out_scale: float, pipeline: int = 1):
    import jax.experimental.pallas as pl

    pc = p * c
    # conv1 output rows needed by act2 (act2 output rows [-pl2, s_t+ph2)
    # read conv1 rows a further e2 beyond); act1 rows needed by conv1.
    t_lo = -(pl2 + e2)
    n_t = s_t + pl2 + ph2 + 2 * e2
    a1_lo = t_lo - pl1
    n_a1 = n_t + pl1 + ph1
    sh = s_t // pipeline  # subtile rows (pipeline > 1: VPU/MXU interleave)
    quant = _is_int8(dot_dtype)

    def kernel(cur_ref, prev_ref, nxt_ref, ab1_ref, w1_ref, b1_ref,
               ab2_ref, w2_ref, b2_ref, *rest):
        if quant:
            sw1_ref, sw2_ref, rest = rest[0], rest[1], rest[2:]
        res_refs, out_ref = rest[:-1], rest[-1]
        i = pl.program_id(1)
        tile_start = i * s_t
        ext = jnp.concatenate(
            [prev_ref[0].astype(jnp.float32),
             cur_ref[0].astype(jnp.float32),
             nxt_ref[0].astype(jnp.float32)], axis=0)  # rows -hl8 .. s_t+hr8

        def conv1(a1, n=n_t):
            if quant:
                aq, s_x = _quant_tile(a1)
                t_i = jnp.zeros((n, pc), jnp.int32)
                for qi, off in enumerate(off1):
                    t_i = t_i + jax.lax.dot_general(
                        aq[off + pl1 : off + pl1 + n, :], w1_ref[qi],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                t = t_i.astype(jnp.float32) * (s_x * sw1_ref[0, :])
            else:
                a1 = a1.astype(dot_dtype)
                t = jnp.zeros((n, pc), jnp.float32)
                for qi, off in enumerate(off1):
                    t = t + jax.lax.dot_general(
                        a1[off + pl1 : off + pl1 + n, :], w1_ref[qi],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            return t + b1_ref[0, :].astype(jnp.float32)

        def conv2(a2, row0: int, n: int):
            if quant:
                aq, s_x = _quant_tile(a2)
                acc_i = jnp.zeros((n, pc), jnp.int32)
                for qi, off in enumerate(off2):
                    acc_i = acc_i + jax.lax.dot_general(
                        aq[off + pl2 : off + pl2 + n, :], w2_ref[qi],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                acc = acc_i.astype(jnp.float32) * (s_x * sw2_ref[0, :])
            else:
                a2 = a2.astype(dot_dtype)
                acc = jnp.zeros((n, pc), jnp.float32)
                for qi, off in enumerate(off2):
                    acc = acc + jax.lax.dot_general(
                        a2[off + pl2 : off + pl2 + n, :], w2_ref[qi],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = acc + b2_ref[0, :].astype(jnp.float32)
            acc = acc + cur_ref[0, row0 : row0 + n].astype(jnp.float32)
            for res_ref in res_refs:
                acc = acc + res_ref[0, row0 : row0 + n].astype(jnp.float32)
            if out_scale != 1.0:
                acc = acc * out_scale
            return acc

        def finish(a2):
            out_ref[0, :, :] = conv2(a2, 0, s_t).astype(out_ref.dtype)

        is_edge = (i == 0) | (tile_start + s_t + hr8 > s_true)

        @pl.when(is_edge)
        def _():
            e2_ = _replicate_rows(ext, tile_start - hl8, s_true, p, c)
            a1 = _act_rows(e2_, -hl8, ab1_ref[0, :], ab1_ref[1, :], p, c,
                           a1_lo, n_a1, tile_start, s_true)
            grow1 = tile_start + a1_lo + jax.lax.broadcasted_iota(
                jnp.int32, (n_a1, pc), 0)
            a1 = jnp.where((grow1 >= 0) & (grow1 < s_true), a1, 0.0)
            t = conv1(a1)
            # act2's up-FIR reads conv1's output with replicate clipping;
            # t rows outside [0, s_true) hold conv-of-zeros junk —
            # substitute the clipped edge content (t's local row 0 is abs
            # row tile_start+t_lo)
            t = _replicate_rows(t, tile_start + t_lo, s_true, p, c)
            a2 = _act_rows(t, t_lo, ab2_ref[0, :], ab2_ref[1, :], p, c,
                           -pl2, s_t + pl2 + ph2, tile_start, s_true)
            grow2 = tile_start - pl2 + jax.lax.broadcasted_iota(
                jnp.int32, (s_t + pl2 + ph2, pc), 0)
            a2 = jnp.where((grow2 >= 0) & (grow2 < s_true), a2, 0.0)
            finish(a2)

        @pl.when(jnp.logical_not(is_edge))
        def _():
            if pipeline <= 1:
                a1 = _act_rows(ext, -hl8, ab1_ref[0, :], ab1_ref[1, :], p, c,
                               a1_lo, n_a1)
                t = conv1(a1)
                a2 = _act_rows(t, t_lo, ab2_ref[0, :], ab2_ref[1, :], p, c,
                               -pl2, s_t + pl2 + ph2)
                finish(a2)
                return
            # Subtile software pipeline: the monolithic chain act1(VPU) ->
            # conv1(MXU) -> act2(VPU) -> conv2(MXU) serializes the two
            # engines (measured ~30% of BOTH peaks, PERF.md round-4 MFU
            # table). Splitting the tile into `pipeline` row subtiles and
            # interleaving emission puts independent VPU work (next
            # subtile's act) adjacent to each MXU dot so Mosaic's scheduler
            # can dual-issue. Each subtile recomputes the small act/conv
            # halos; the ext lane-roll cache is shared via ush_x.
            ush_x = _lane_shifter(ext, -hl8, p, c)
            n_t_q = sh + pl2 + ph2 + 2 * e2   # conv1 rows per subtile
            n_a2_q = sh + pl2 + ph2           # act2 rows per subtile

            def act1_q(q):
                lo = (q * sh - (pl2 + e2)) - pl1
                return _act_rows(ext, -hl8, ab1_ref[0, :], ab1_ref[1, :],
                                 p, c, lo, n_t_q + pl1 + ph1, ush_x=ush_x)

            a1_next = act1_q(0)
            for q in range(pipeline):
                a1_cur = a1_next
                t_q = conv1(a1_cur, n=n_t_q)                        # MXU
                if q + 1 < pipeline:
                    a1_next = act1_q(q + 1)                         # VPU
                a2_q = _act_rows(t_q, q * sh - (pl2 + e2),          # VPU
                                 ab2_ref[0, :], ab2_ref[1, :], p, c,
                                 q * sh - pl2, n_a2_q)
                o_q = conv2(a2_q, q * sh, sh)                       # MXU
                out_ref[0, q * sh : (q + 1) * sh, :] = o_q.astype(out_ref.dtype)

    return kernel


def pallas_packed_amp_unit(xp: jax.Array, alpha1: jax.Array, beta1,
                           alpha2: jax.Array, beta2, logscale: bool,
                           w1: jax.Array, b1, w2: jax.Array, b2, *,
                           pad1: int, dil1: int, pad2: int, p: int,
                           extra_residuals=None, out_scale: float = 1.0,
                           dot_dtype=jnp.float32, interpret: bool = False,
                           s_t_cap: int = 128, pipeline: int = 1) -> jax.Array:
    """One kernel computing ``out_scale * (conv2(act2(conv1(act1(xp)))) +
    xp + sum(extra_residuals))`` — a whole AMPBlock1 dilation unit. Equals
    the two fused act->conv pairs it replaces with both intermediates in
    VMEM; sequence-edge replicate semantics are exact in-kernel (see the
    act section header). ``pipeline`` > 1 splits interior tiles into that
    many row subtiles with interleaved act/conv emission so the VPU snake
    work and MXU conv dots can dual-issue (same math, small halo
    recompute)."""
    interpret = interpret or jax.default_backend() != "tpu"
    bsz, s, pcin = xp.shape
    k1, cin, cout = w1.shape
    assert pcin == p * cin and cin == cout and w2.shape[1] == cin
    residuals = _as_residual_tuple(extra_residuals)

    s_t = _pick_rows(s, cap=s_t_cap)
    if s_t == 0:  # pad rows; the kernel reads by the TRUE length
        s_pad = -(-max(64, s) // 8) * 8
        xq = jnp.pad(xp, ((0, 0), (0, s_pad - s), (0, 0)))
        rq = tuple(jnp.pad(r, ((0, 0), (0, s_pad - s), (0, 0)))
                   for r in residuals)
        return _amp_unit_core(
            xq, s, alpha1, beta1, alpha2, beta2, logscale, w1, b1, w2, b2,
            pad1, dil1, pad2, p, rq, out_scale, dot_dtype, interpret,
            _pick_rows(s_pad, cap=s_t_cap), pipeline)[:, :s, :]
    return _amp_unit_core(xp, s, alpha1, beta1, alpha2, beta2, logscale,
                          w1, b1, w2, b2, pad1, dil1, pad2, p, residuals,
                          out_scale, dot_dtype, interpret, s_t, pipeline)


def _amp_unit_core(xp, s_true, alpha1, beta1, alpha2, beta2, logscale,
                   w1, b1, w2, b2, pad1, dil1, pad2, p, residuals,
                   out_scale, dot_dtype, interpret, s_t, pipeline: int = 1):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, s, pcin = xp.shape
    k1, cin, cout = w1.shape
    pc = p * cin
    n_tiles = s // s_t
    off1, pl1, ph1, off2, pl2, ph2, e2, hl8, hr8 = _unit_geometry(
        k1, pad1, dil1, w2.shape[0], pad2, 1, p)

    wnz1, _, _, _ = pack_conv_kernel_nz(w1, pad1, dil1, p)
    wnz2, _, _, _ = pack_conv_kernel_nz(w2, pad2, 1, p)
    bias1 = (jnp.tile(b1, p) if b1 is not None
             else jnp.zeros((pc,), jnp.float32)).reshape(1, pc)
    bias2 = (jnp.tile(b2, p) if b2 is not None
             else jnp.zeros((pc,), jnp.float32)).reshape(1, pc)

    def ab_of(alpha, beta):
        a_ = jnp.exp(alpha) if logscale else alpha
        bb = (jnp.exp(beta) if logscale else beta) if beta is not None else a_
        return jnp.stack([jnp.tile(a_, p), jnp.tile(bb, p)]).astype(jnp.float32)

    ab1, ab2 = ab_of(alpha1, beta1), ab_of(alpha2, beta2)

    blocked = s_t % hl8 == 0 and s_t % hr8 == 0 and n_tiles > 1
    if blocked:
        prev = nxt = xp
        rp, rn = s_t // hl8, s_t // hr8
        prev_spec = lambda b_, i: (b_, jnp.maximum(i * rp - 1, 0), 0)
        nxt_spec = lambda b_, i: (
            b_, jnp.minimum((i + 1) * rn, s // hr8 - 1), 0)
    else:
        ip = np.clip(np.arange(n_tiles)[:, None] * s_t - hl8
                     + np.arange(hl8)[None, :], 0, s - 1).reshape(-1)
        inx = np.clip((np.arange(n_tiles)[:, None] + 1) * s_t
                      + np.arange(hr8)[None, :], 0, s - 1).reshape(-1)
        prev = xp[:, ip, :].reshape(bsz, n_tiles * hl8, pcin)
        nxt = xp[:, inx, :].reshape(bsz, n_tiles * hr8, pcin)
        prev_spec = lambda b_, i: (b_, i, 0)
        nxt_spec = lambda b_, i: (b_, i, 0)

    if pipeline > 1 and s_t % (8 * pipeline) != 0:
        pipeline = 1  # subtiles must stay sublane-aligned
    kernel = _make_amp_unit_kernel(
        s_t, p, cin, s_true, off1, pl1, ph1, off2, pl2, ph2, e2, hl8, hr8,
        dot_dtype, out_scale, pipeline)
    in_specs = [
        pl.BlockSpec((1, s_t, pcin), lambda b_, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hl8, pcin), prev_spec, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hr8, pcin), nxt_spec, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, pcin), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((len(off1), pcin, pc), lambda b_, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pc), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, pcin), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((len(off2), pcin, pc), lambda b_, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pc), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if _is_int8(dot_dtype):
        wq1, s_w1 = _quant_weights_per_cout(wnz1.astype(jnp.float32))
        wq2, s_w2 = _quant_weights_per_cout(wnz2.astype(jnp.float32))
        args = [xp, prev, nxt, ab1, wq1, bias1, ab2, wq2, bias2,
                s_w1.reshape(1, pc), s_w2.reshape(1, pc)]
        in_specs += [pl.BlockSpec((1, pc), lambda b_, i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    else:
        args = [xp, prev, nxt, ab1, wnz1.astype(dot_dtype), bias1,
                ab2, wnz2.astype(dot_dtype), bias2]
    for r in residuals:
        in_specs.append(pl.BlockSpec((1, s_t, pc),
                                     lambda b_, i: (b_, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(r)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, s, pc), xp.dtype),
        grid=(bsz, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s_t, pc), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
