"""BigVGAN 48 kHz 256-band generator, TPU-native.

Re-design of the reference vocoder (reference:
src/flowhigh/models/bigvgan/models.py:124-194, activations.py,
alias_free_torch/{filter,resample,act}.py) around XLA's conv lowering:

- feature-last [B, T, C] everywhere: channels ride the TPU lane dimension, so
  pointwise snake activations vectorize on the VPU and the big channel-mixing
  convs hit the MXU without layout transposes.
- weight norm is folded into plain kernels at checkpoint-load time (the
  reference folds it at init via remove_weight_norm, models.py:196-204), so
  the forward pass never sees g/v pairs.
- the anti-aliased activation (2x upsample -> snake -> 2x downsample) is
  expressed with static Kaiser-sinc FIRs baked at trace time; the fused
  Pallas kernel for this memory-bound chain lives in ops/ and is switched in
  by the caller for the fast path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from ..config import VocoderConfig


# --- static FIR design (host, trace-time) ------------------------------------

@functools.lru_cache(maxsize=32)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Windowed-sinc LPF, parity with the reference's filter design
    (reference: alias_free_torch/filter.py:28-57)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = sps.windows.kaiser(kernel_size, beta, sym=True)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


# --- primitive convs (NHC layout) --------------------------------------------

def conv1d(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None, *,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1, mxu: bool = False) -> jax.Array:
    """x: [B, T, Cin], w: [K, Cin/groups, Cout] (HIO).

    ``mxu=True`` lowers the conv as K shifted matmuls (sum_i shift_i(x) @ W_i)
    so the channel contraction runs on the systolic array — XLA's TPU conv
    path lowers these narrow-channel 1-D convs onto the VPU instead.
    Only for stride=1, groups=1.
    """
    if mxu and stride == 1 and groups == 1:
        k = w.shape[0]
        t = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
        y = None
        for i in range(k):
            o = jnp.einsum("btc,cd->btd", xp[:, i * dilation : i * dilation + t, :],
                           w[i], preferred_element_type=jnp.float32)
            y = o if y is None else y + o
        y = y.astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x, w, (stride,), [(padding, padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
        )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
                     *, stride: int, padding: int = 0,
                     groups: int = 1) -> jax.Array:
    """torch ConvTranspose1d semantics: out = (T-1)*stride - 2*padding + K.

    x: [B, T, Cin]; w: [K, Cout/groups, Cin] in *transpose* orientation —
    expressed as a fractionally-strided conv: dilate the input by ``stride``,
    flip the kernel, swap in/out channels. (A polyphase phases-as-channels
    variant compiled faster here but ran ~75x slower — the interleave reshape
    dominates; at the vocoder's small spatial extents the lhs_dilation conv
    both compiles acceptably and runs at full speed.)
    """
    k = w.shape[0]
    w_conv = jnp.flip(w, axis=0)            # flip taps
    w_conv = jnp.swapaxes(w_conv, 1, 2)     # -> HIO for the forward conv
    y = jax.lax.conv_general_dilated(
        x, w_conv, (1,), [(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def _replicate_pad_time(x: jax.Array, left: int, right: int) -> jax.Array:
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (left, right)
    return jnp.pad(x, cfg, mode="edge")


def upsample1d(x: jax.Array, ratio: int = 2, kernel_size: Optional[int] = None) -> jax.Array:
    """Anti-aliased upsample (reference: alias_free_torch/resample.py:10-33)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    c = x.shape[-1]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k)
    w = (jnp.asarray(filt).reshape(k, 1, 1)
         * jnp.ones((1, 1, c))).astype(x.dtype)  # [K,1,C]
    x = _replicate_pad_time(x, pad, pad)
    # torch conv_transpose1d with symmetric filter: flip == identity, but keep
    # the generic path via conv_transpose1d (depthwise: w as [K, Cout/groups=1, Cin...])
    y = ratio * jax.lax.conv_general_dilated(
        x, w, (1,), [(k - 1, k - 1)], lhs_dilation=(ratio,),
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
    )
    t = y.shape[1]
    return y[:, pad_left : t - pad_right, :]


def downsample1d(x: jax.Array, ratio: int = 2, kernel_size: Optional[int] = None) -> jax.Array:
    """Anti-aliased strided low-pass (reference: alias_free_torch/resample.py:36-48,
    filter.py:60-94)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    c = x.shape[-1]
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k)
    w = (jnp.asarray(filt).reshape(k, 1, 1)
         * jnp.ones((1, 1, c))).astype(x.dtype)
    x = _replicate_pad_time(x, pad_left, pad_right)
    return jax.lax.conv_general_dilated(
        x, w, (ratio,), [(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
    )


def snake(x: jax.Array, alpha: jax.Array, logscale: bool) -> jax.Array:
    """x + (1/a) sin^2(a x), per-channel alpha (reference: activations.py:9-59)."""
    if logscale:
        alpha = jnp.exp(alpha)
    return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(x * alpha))


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array, logscale: bool) -> jax.Array:
    """x + (1/b) sin^2(a x) (reference: activations.py:62-119)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


class Activation1d(nn.Module):
    """2x upsample -> snake(beta) -> 2x downsample
    (reference: alias_free_torch/act.py:8-27)."""
    channels: int
    activation: str = "snakebeta"  # snake | snakebeta
    logscale: bool = True
    fused: bool = False  # Pallas fused up2->snake->down2 (ops/fused_act.py)
    packed_p: int = 1    # >1: input/output are space-to-depth packed [B,T/p,p*C]

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        # x: [B, T, C] (or [B, T/p, p*C] when packed_p > 1).
        # ``return_params=True``: create/expose (alpha, beta) without
        # computing — the fused act->conv kernel consumes them directly
        # while the checkpoint layout keeps them under this module's name.
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = None
        if self.activation == "snakebeta":
            beta = self.param("beta", init, (self.channels,))
        if return_params:
            return alpha, beta
        if self.packed_p > 1:
            from ..ops.packed import packed_snake_activation1d
            return packed_snake_activation1d(x, alpha, beta, self.logscale,
                                             self.packed_p)
        if self.fused:
            from ..ops import fused_snake_activation1d
            return fused_snake_activation1d(x, alpha, beta, self.logscale)
        y = upsample1d(x, 2, 12)
        if beta is not None:
            y = snake_beta(y, alpha, beta, self.logscale)
        else:
            y = snake(y, alpha, self.logscale)
        return downsample1d(y, 2, 12)


class AMPBlock1(nn.Module):
    """3x [act -> dilated conv -> act -> conv] residual fusion
    (reference: bigvgan/models.py:21-78)."""
    channels: int
    kernel_size: int
    dilations: Sequence[int]
    activation: str
    logscale: bool
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    mxu_convs: bool = False
    packed_p: int = 1          # >1: run on space-to-depth packed features
    conv_dtype: Optional[jnp.dtype] = None  # packed-conv contraction dtype
    pallas_convs: bool = False  # Pallas MXU conv kernel (serving fast path)
    # fuse [act -> conv] pairs into one kernel: False | True | "auto" |
    # "pairs". "auto" fuses only k<=3 convs — the only profitable size
    # before the act halo was tightened to +-ceil(3/p) rows; with that
    # change fusing every VMEM-eligible pair measures fastest and the
    # serving default in sr.py is True, which ALSO fuses whole dilation
    # units (act->conv->act->conv->+x) where they fit VMEM. "pairs" fuses
    # every eligible pair but skips the unit kernel (the A/B knob for
    # benchmarking the unit fusion in isolation).
    fuse_act_conv: object = False
    # subtile software pipeline inside the fused unit/pair kernels (>1:
    # interleave VPU act / MXU conv emission, ops/packed.py) — A/B knob
    kernel_pipeline: int = 1

    def _act_then_conv(self, x, act_name, w, b, pad, dil, residual=None,
                       extra_residuals=None, out_scale: float = 1.0):
        """act -> conv, fused into one Pallas kernel when eligible
        (ops/packed.py:pallas_packed_act_conv1d); falls back to the
        separate act + conv pair otherwise."""
        act = Activation1d(self.channels, self.activation, self.logscale,
                           self.fused, self.packed_p, name=act_name)
        fuse = self.fuse_act_conv
        if fuse == "auto":
            fuse = w.shape[0] <= 3
        # p=1 is eligible too: the packed act at p=1 degenerates to pure
        # row slices, so fusing saves the act's HBM round-trip whenever the
        # weights fit VMEM (act_conv_fusable)
        if fuse and self.pallas_convs:
            from ..ops.packed import act_conv_plan, pallas_packed_act_conv1d
            k = w.shape[0]
            cap = act_conv_plan(k, pad, dil, self.packed_p, self.channels)
            if cap:
                alpha, beta = act(x, return_params=True)
                extras = tuple(extra_residuals) if extra_residuals else ()
                res = (() if residual is None else (residual,)) + extras
                return pallas_packed_act_conv1d(
                    x, alpha, beta, self.logscale, w.astype(self.dtype), b,
                    pad=pad, dilation=dil, p=self.packed_p,
                    residual=res or None, out_scale=out_scale,
                    dot_dtype=self.conv_dtype or jnp.float32, s_t_cap=cap,
                    pipeline=self.kernel_pipeline)
        return self._conv(act(x), w, b, pad, dil, residual,
                          extra_residuals, out_scale)

    def _conv(self, xt, w, b, pad, dil, residual=None, extra_residuals=None,
              out_scale: float = 1.0):
        extras = tuple(extra_residuals) if extra_residuals else ()
        if self.pallas_convs:
            from ..ops.packed import pallas_packed_conv1d
            # f32 dots measured as fast as bf16 here (the kernel is HBM
            # bandwidth-bound, not MXU-bound) — default to exact f32
            res = (() if residual is None else (residual,)) + extras
            return pallas_packed_conv1d(
                xt, w.astype(self.dtype), b, pad=pad, dilation=dil,
                p=self.packed_p, residual=res or None, out_scale=out_scale,
                dot_dtype=self.conv_dtype or jnp.float32)
        if self.packed_p > 1:
            from ..ops.packed import packed_conv1d
            y = packed_conv1d(xt, w.astype(self.dtype), b, pad=pad,
                              dilation=dil, p=self.packed_p,
                              conv_dtype=self.conv_dtype)
        else:
            y = conv1d(xt.astype(self.dtype), w.astype(self.dtype), b,
                       padding=pad, dilation=dil, mxu=self.mxu_convs)
        if residual is not None:
            y = y + residual
        for r in extras:
            y = y + r
        return y if out_scale == 1.0 else y * out_scale

    def _unit_fused(self, x, j, d, w, b, w2, b2, extras, scale):
        """Whole [act -> conv1 -> act -> conv2 -> +x] dilation unit as ONE
        Pallas kernel (ops/packed.py:pallas_packed_amp_unit); None when the
        unit doesn't fit VMEM."""
        from ..ops.packed import amp_unit_plan, pallas_packed_amp_unit
        k = self.kernel_size
        cap = amp_unit_plan(k, d, self.packed_p, self.channels)
        if not cap:
            return None
        a1, be1 = Activation1d(self.channels, self.activation, self.logscale,
                               self.fused, self.packed_p,
                               name=f"act1_{j}")(x, return_params=True)
        a2, be2 = Activation1d(self.channels, self.activation, self.logscale,
                               self.fused, self.packed_p,
                               name=f"act2_{j}")(x, return_params=True)
        return pallas_packed_amp_unit(
            x, a1, be1, a2, be2, self.logscale, w.astype(self.dtype), b,
            w2.astype(self.dtype), b2, pad1=(k * d - d) // 2, dil1=d,
            pad2=(k - 1) // 2, p=self.packed_p,
            extra_residuals=extras or None, out_scale=scale,
            dot_dtype=self.conv_dtype or jnp.float32, s_t_cap=cap,
            pipeline=self.kernel_pipeline)

    @nn.compact
    def __call__(self, x, extra_residuals=None, out_scale: float = 1.0):
        """``extra_residuals``/``out_scale`` apply to the LAST conv only:
        they let BigVGAN fold the MRF branch average into this block's final
        kernel (out = out_scale * (conv + x + sum(extra_residuals)))."""
        k = self.kernel_size
        n_last = len(self.dilations) - 1
        for j, d in enumerate(self.dilations):
            w = self.param(f"convs1_{j}_kernel", nn.initializers.lecun_normal(),
                           (k, self.channels, self.channels))
            b = self.param(f"convs1_{j}_bias", nn.initializers.zeros, (self.channels,))
            w2 = self.param(f"convs2_{j}_kernel", nn.initializers.lecun_normal(),
                            (k, self.channels, self.channels))
            b2 = self.param(f"convs2_{j}_bias", nn.initializers.zeros, (self.channels,))
            extras = extra_residuals if j == n_last else None
            scale = out_scale if j == n_last else 1.0
            if self.fuse_act_conv is True and self.pallas_convs:
                y = self._unit_fused(x, j, d, w, b, w2, b2, extras, scale)
                if y is not None:
                    x = y
                    continue
            xt = self._act_then_conv(x, f"act1_{j}", w, b, (k * d - d) // 2, d)
            x = self._act_then_conv(
                xt, f"act2_{j}", w2, b2, (k - 1) // 2, 1, residual=x,
                extra_residuals=extras, out_scale=scale)
        return x


class AMPBlock2(nn.Module):
    """2x [act -> dilated conv] residual (reference: bigvgan/models.py:81-117)."""
    channels: int
    kernel_size: int
    dilations: Sequence[int]
    activation: str
    logscale: bool
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    packed_p: int = 1
    conv_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        for j, d in enumerate(self.dilations):
            xt = Activation1d(self.channels, self.activation, self.logscale,
                              self.fused, self.packed_p, name=f"act_{j}")(x)
            w = self.param(f"convs_{j}_kernel", nn.initializers.lecun_normal(),
                           (k, self.channels, self.channels))
            b = self.param(f"convs_{j}_bias", nn.initializers.zeros, (self.channels,))
            if self.packed_p > 1:
                from ..ops.packed import packed_conv1d
                xt = packed_conv1d(xt, w.astype(self.dtype), b,
                                   pad=(k * d - d) // 2, dilation=d,
                                   p=self.packed_p, conv_dtype=self.conv_dtype)
            else:
                xt = conv1d(xt.astype(self.dtype), w.astype(self.dtype), b,
                            padding=(k * d - d) // 2, dilation=d)
            x = xt + x
        return x


class BigVGAN(nn.Module):
    """Generator: conv_pre -> [up -> MRF avg]* -> act -> conv_post -> tanh
    (reference: bigvgan/models.py:124-194)."""
    cfg: VocoderConfig
    dtype: jnp.dtype = jnp.float32
    fused_act: bool = False  # use the Pallas fused snake activation
    mxu_convs: bool = False  # lower resblock convs as shifted matmuls
    packed: bool = False     # space-to-depth MRF for narrow-channel stages
    conv_dtype: Optional[jnp.dtype] = None  # packed-conv MXU dtype (e.g. bf16)
    pallas_convs: bool = False  # resblock convs via the Pallas MXU kernel
    fuse_act_conv: object = False  # False | True | "auto": see AMPBlock1
    kernel_pipeline: int = 1  # subtile VPU/MXU interleave (see AMPBlock1)
    # HBM dtype of the MRF feature maps (ALL stages, packed or not): halves
    # the act/conv pass traffic while the Pallas kernels accumulate in f32
    # internally. Stage-boundary upsamplers still run in ``dtype`` (inputs
    # are cast back to f32 before each ConvTranspose). Measured: only +2%
    # end-to-end (the packed act kernel is VPU-pass-bound, PERF.md) at
    # 0.128 dB LSD vs f32 — an opt-in for traffic-constrained deployments.
    storage_dtype: Optional[jnp.dtype] = None

    def _boundary_dtype(self):
        """MXU dtype for the NON-resblock convs (stage-boundary upsamplers,
        conv_post). int8 quantization applies to the resblock convs only:
        the upsamplers already run at ~81% MXU utilization (PERF.md round-4
        MFU table — nothing to win) and conv_post feeds the output tanh
        directly, so both keep exact dots."""
        if self.conv_dtype is not None and jnp.dtype(self.conv_dtype) == jnp.int8:
            return jnp.float32
        return self.conv_dtype or jnp.float32

    def _pack_factor(self, ch: int, t: int) -> int:
        """Smallest power-of-two p with ch*p >= 256 (full lane tiles); 1 when
        the stage is already wide or t doesn't divide."""
        if not self.packed:
            return 1
        p = 1
        while ch * p < 256:
            p *= 2
        return p if (p > 1 and t % p == 0) else 1

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel: [B, T, n_mels] -> waveform [B, T * prod(upsample_rates)]."""
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        block_cls = AMPBlock1 if cfg.resblock == "1" else AMPBlock2

        ch = cfg.upsample_initial_channel
        w = self.param("conv_pre_kernel", nn.initializers.lecun_normal(),
                       (7, cfg.num_mels, ch))
        b = self.param("conv_pre_bias", nn.initializers.zeros, (ch,))
        x = conv1d(mel.astype(self.dtype), w.astype(self.dtype), b, padding=3)

        p = 1  # packing of x across stage boundaries
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch_out = cfg.upsample_initial_channel // (2 ** (i + 1))
            wt = self.param(f"ups_{i}_kernel", nn.initializers.lecun_normal(),
                            (k, ch_out, ch))  # [K, Cout, Cin] transpose orientation
            bt = self.param(f"ups_{i}_bias", nn.initializers.zeros, (ch_out,))
            t_next = x.shape[1] * p * u
            p_next = self._pack_factor(ch_out, t_next)
            # the big stage-boundary upsamplers run as packed Pallas
            # transposed convs (packed in -> packed out, no relayout, no XLA
            # lhs_dilation). p_out=1 is fine too — the super-row plan
            # degenerates to one input row per super-row, and XLA's
            # lhs_dilation lowering of the wide early upsamplers is the slow
            # path this kernel exists to avoid
            use_pallas_up = (self.pallas_convs and self.packed
                             and (k - u) % 2 == 0)
            if use_pallas_up:
                g_i = p_next // math.gcd(u * p, p_next)  # input super-row size
                use_pallas_up = x.shape[1] % g_i == 0
            if use_pallas_up:
                from ..ops.packed import pallas_packed_conv_transpose1d
                x = pallas_packed_conv_transpose1d(
                    x.astype(self.dtype), wt.astype(self.dtype), bt,
                    stride=u, padding=(k - u) // 2, p_in=p, p_out=p_next,
                    dot_dtype=self._boundary_dtype())
            else:
                if p > 1:
                    from ..ops.packed import unpack_time
                    x = unpack_time(x, p)
                x = conv_transpose1d(x.astype(self.dtype),
                                     wt.astype(self.dtype), bt, stride=u,
                                     padding=(k - u) // 2)
                if p_next > 1:
                    from ..ops.packed import pack_time
                    x = pack_time(x, p_next)
            p = p_next
            if self.storage_dtype is not None:
                # the MRF is HBM-bound: store feature maps in storage_dtype
                # (kernels still accumulate f32); stage-boundary upsamplers
                # read f32 via the astype above
                x = x.astype(self.storage_dtype)
            # MRF: when the branches end in Pallas convs, the 3-branch
            # average folds into the last branch's final kernel (multi-
            # residual + out_scale) instead of a separate full-array pass
            fold_avg = (block_cls is AMPBlock1 and self.pallas_convs
                        and num_kernels > 1)
            ys = []
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
                extra = ({"mxu_convs": self.mxu_convs,
                          "pallas_convs": self.pallas_convs,
                          "fuse_act_conv": self.fuse_act_conv,
                          "kernel_pipeline": self.kernel_pipeline}
                         if block_cls is AMPBlock1 else {})
                block = block_cls(
                    ch_out, rk, rd, cfg.activation, cfg.snake_logscale,
                    dtype=self.dtype, fused=self.fused_act, packed_p=p,
                    conv_dtype=self.conv_dtype, **extra,
                    name=f"resblocks_{i * num_kernels + j}")
                if fold_avg and j == num_kernels - 1:
                    ys.append(block(x, extra_residuals=tuple(ys),
                                    out_scale=1.0 / num_kernels))
                else:
                    ys.append(block(x))
            if fold_avg:
                x = ys[-1]
            else:
                acc = ys[0]
                for y in ys[1:]:
                    acc = acc + y
                x = acc / num_kernels
            ch = ch_out

        x = Activation1d(ch, cfg.activation, cfg.snake_logscale,
                         self.fused_act, packed_p=p, name="activation_post")(x)
        w_post = self.param("conv_post_kernel", nn.initializers.lecun_normal(),
                            (7, ch, 1))
        b_post = self.param("conv_post_bias", nn.initializers.zeros, (1,))
        if p > 1 and self.pallas_convs:
            # XLA's NHC lowering of this conv reads the full [S, p*C] map at
            # 16-27 GB/s (PERF.md); the Pallas kernel reads it at roofline
            # and the [S, p] output is tiny
            from ..ops.packed import pallas_packed_conv1d, unpack_time
            x = pallas_packed_conv1d(x, w_post.astype(self.dtype), b_post,
                                     pad=3, dilation=1, p=p,
                                     dot_dtype=self._boundary_dtype())
            x = unpack_time(x, p)
        elif p > 1:
            from ..ops.packed import packed_conv1d, unpack_time
            x = packed_conv1d(x, w_post.astype(self.dtype), b_post, pad=3,
                              dilation=1, p=p, conv_dtype=self.conv_dtype)
            x = unpack_time(x, p)  # [B, T_wav, 1] — tiny lanes, cheap
        else:
            x = conv1d(x.astype(self.dtype), w_post.astype(self.dtype),
                       b_post, padding=3)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]  # [B, T_wav]
