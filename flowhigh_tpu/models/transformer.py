"""Voicebox-style transformer backbone for the CFM vector field.

TPU-native re-design of the reference backbone
(reference: src/flowhigh/models/transformer.py, attend.py, pos_emb.py):

- One fused QKV projection per layer feeding an einsum attention that XLA
  lowers onto the MXU (seq lengths here are a few hundred to a few thousand
  mel frames; a 2-layer/1024-dim model is firmly in the "let XLA fuse it"
  regime). For long-form single-pass inference the reference's ``attn_flash``
  option maps to a blockwise Pallas flash kernel (O(N) memory); the default
  long-form path remains StreamingSR's chunked overlap-add, which bounds the
  quadratic term at the source and reuses one compiled program per chunk.
- All norms/softmax in f32; matmuls in the configured compute dtype (bf16 on
  TPU); RoPE applied in f32 exactly like the reference's autocast-off blocks
  (reference: src/flowhigh/models/pos_emb.py:58-60).
- Static shapes + optional key-padding mask so variable-length batches ride
  bucketed padding through one compiled program.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize parity: x / max(||x||2, eps).

    Written as rsqrt(max(ss, eps^2)) so the gradient at all-zero rows (padded
    frames) is finite — d/dx sqrt(x) at 0 is inf and poisons the backward pass.
    """
    ss = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(ss, eps * eps))


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch nn.GELU default (jax defaults to tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


def rotary_freqs(seq_len: int, dim_head: int, theta: float = 50000.0,
                 positions: Optional[np.ndarray] = None) -> jax.Array:
    """[seq, dim_head] rotary angle table, duplicated halves
    (reference: src/flowhigh/models/pos_emb.py:29-52). ``positions`` overrides
    the default arange — used for register tokens, which sit at position
    -10000 (reference: transformer.py:192-196)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    t = (np.asarray(positions, dtype=np.float64) if positions is not None
         else np.arange(seq_len, dtype=np.float64))
    freqs = np.einsum("i,j->ij", t, inv_freq)
    freqs = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(freqs, dtype=jnp.float32)


def apply_rotary(pos: jax.Array, t: jax.Array) -> jax.Array:
    """t * cos(pos) + rotate_half(t) * sin(pos), computed in f32."""
    dtype = t.dtype
    t32 = t.astype(jnp.float32)
    half = t32.shape[-1] // 2
    t1, t2 = t32[..., :half], t32[..., half:]
    rotated = jnp.concatenate([-t2, t1], axis=-1)
    out = t32 * jnp.cos(pos) + rotated * jnp.sin(pos)
    return out.astype(dtype)


class RMSNorm(nn.Module):
    """normalize(x) * sqrt(dim) * gamma (reference: transformer.py:49-59)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        y = l2norm(x.astype(jnp.float32)) * (self.dim ** 0.5)
        return (y * gamma).astype(x.dtype)


class AdaptiveRMSNorm(nn.Module):
    """Time-conditioned RMSNorm, identity at init
    (reference: transformer.py:61-88)."""
    dim: int
    cond_dim: int

    @nn.compact
    def __call__(self, x, *, cond):
        to_gamma = nn.Dense(
            self.dim, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones, name="to_gamma", dtype=jnp.float32)
        to_beta = nn.Dense(
            self.dim, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="to_beta", dtype=jnp.float32)
        gamma = to_gamma(cond.astype(jnp.float32))[:, None, :]  # [B, 1, D]
        beta = to_beta(cond.astype(jnp.float32))[:, None, :]
        y = l2norm(x.astype(jnp.float32)) * (self.dim ** 0.5)
        return (y * gamma + beta).astype(x.dtype)


class MultiheadRMSNorm(nn.Module):
    """Per-head qk RMSNorm with learned gamma, fixed sqrt(d) scale
    (reference: attend.py:144-151)."""
    dim_head: int
    heads: int

    @nn.compact
    def __call__(self, x):  # x: [B, H, N, Dh]
        gamma = self.param("gamma", nn.initializers.ones, (self.heads, 1, self.dim_head))
        y = l2norm(x.astype(jnp.float32)) * gamma * (self.dim_head ** 0.5)
        return y.astype(x.dtype)


# CI hook: run the Pallas flash kernel in TPU-interpret mode on non-TPU
# backends (tests/test_transformer_features.py) so the kernel itself — not
# just its einsum fallback — has automated coverage.
FLASH_INTERPRET = False


def _flash_attention(q, k, v, mask, scale):
    """Blockwise (flash) attention via the Pallas TPU kernel — O(N) memory,
    for long-form single-pass inference (the reference's ``attn_flash``
    option maps to torch SDPA, attend.py:40-100). q/k/v: [B, H, N, Dh];
    ``mask``: key-padding [B, N] bool or None. Pads N up to a block
    multiple; padded positions are isolated via segment ids.

    Numerics: the multi-block running-max softmax deviates from the exact
    einsum path when logits are sharp — measured ~2.6e-3 max at the
    attention output with this model's fixed qk-norm scale 10 over 1024
    keys (3.5e-6 within one 512 block; the same class of deviation as the
    torch SDPA-flash backend the reference wraps). Use for sequences where
    the dense score matrix no longer fits (a 5-min clip is 30k frames =
    57 GB of scores); einsum stays the default elsewhere."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, n, dh = q.shape
    blk = min(512, max(128, -(-n // 128) * 128))
    n_pad = -(-n // blk) * blk
    if mask is None:
        mask = jnp.ones((b, n), bool)
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        mask = jnp.pad(mask, ((0, 0), (0, n_pad - n)))
    ids = mask.astype(jnp.int32)  # pads = segment 0: attend only each other
    sizes = fa.BlockSizes(block_q=blk, block_k_major=blk, block_k=blk,
                          block_b=1)

    def run():
        return fa.flash_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32),
            segment_ids=fa.SegmentIds(q=ids, kv=ids), sm_scale=float(scale),
            block_sizes=sizes)

    if FLASH_INTERPRET and jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = run()
    else:
        out = run()
    return out[:, :, :n, :]


class Attention(nn.Module):
    """Fused-QKV multi-head attention with qk-norm + RoPE
    (reference: attend.py:153-189, 102-139). ``dropout`` applies to the
    attention matrix after softmax (reference: attend.py:49,131).
    ``use_flash`` switches to the blockwise Pallas kernel on TPU (O(N)
    memory for long-form); it falls back to the einsum path off-TPU and
    whenever attention dropout is active (the flash kernel has none,
    exactly like torch SDPA's inference path the reference wraps)."""
    dim: int
    heads: int = 16
    dim_head: int = 64
    qk_norm: bool = True
    qk_norm_scale: float = 10.0
    dropout: float = 0.0
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, rotary: jax.Array, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(b, n, h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))

        if self.qk_norm:
            q = MultiheadRMSNorm(dh, h, name="q_norm")(q)
            k = MultiheadRMSNorm(dh, h, name="k_norm")(k)
            scale = self.qk_norm_scale
        else:
            scale = dh ** -0.5

        q = apply_rotary(rotary, q)
        k = apply_rotary(rotary, k)

        flash_ok = (self.use_flash
                    and (self.dropout == 0.0 or deterministic)
                    and (jax.default_backend() == "tpu" or FLASH_INTERPRET))
        if flash_ok:
            out = _flash_attention(q, k, v, mask, scale).astype(self.dtype)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                             preferred_element_type=jnp.float32) * scale
            if mask is not None:  # key-padding mask [B, N] bool (True = keep)
                sim = jnp.where(mask[:, None, None, :], sim,
                                jnp.finfo(jnp.float32).min)
            attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
            if self.dropout > 0.0:
                attn = nn.Dropout(self.dropout,
                                  deterministic=deterministic)(attn)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out", dtype=self.dtype)(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward, inner dim int(dim*mult*2/3), dropout between
    GEGLU and the output projection (reference: transformer.py:92-104)."""
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult * 2 / 3)
        xg = nn.Dense(inner * 2, name="proj_in", dtype=self.dtype)(x)
        x_, gate = jnp.split(xg, 2, axis=-1)
        x_ = gelu_exact(gate.astype(jnp.float32)).astype(self.dtype) * x_
        if self.dropout > 0.0:
            x_ = nn.Dropout(self.dropout, deterministic=deterministic)(x_)
        return nn.Dense(self.dim, name="proj_out", dtype=self.dtype)(x_)


class GateLoop(nn.Module):
    """Simple GateLoop layer via ``jax.lax.associative_scan``.

    The reference's optional gateloop layers (transformer.py:119,152-153)
    come from the external ``gateloop_transformer`` package — which itself
    exposes a ``use_jax_associative_scan`` flag; here the jax path is the
    native one. Implements the simplified data-controlled linear recurrence
    of the GateLoop paper (arXiv:2311.01927, the SimpleGateLoopLayer
    variant): per-channel state ``s_t = a_t * s_{t-1} + k_t * v_t`` with
    sigmoid-gated transition ``a_t`` and output ``y_t = q_t * s_t``, followed
    by post-LN (the reference passes ``post_ln=True``). Residual is added by
    the caller, matching ``x = gateloop(x) + x`` (transformer.py:221-222)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(self.dim, name="norm")(x)
        qkva = nn.Dense(self.dim * 4, use_bias=False, name="to_qkva",
                        dtype=self.dtype)(h)
        q, k, v, a = jnp.split(qkva.astype(jnp.float32), 4, axis=-1)
        a = jax.nn.sigmoid(a)

        def combine(left, right):
            a1, b1 = left
            a2, b2 = right
            return a1 * a2, b1 * a2 + b2

        _, s = jax.lax.associative_scan(combine, (a, k * v), axis=1)
        y = nn.LayerNorm(name="post_ln")(q * s)
        return y.astype(x.dtype)


class Transformer(nn.Module):
    """Pre-norm transformer with adaptive RMSNorm time conditioning
    (reference: transformer.py:108-234), including the optional reference
    features: register tokens packed to the left at rotary position -10000
    (:135-139,177-198), U-Net skip connections with a learned combiner on the
    second-half layers scaled by 2^-0.5 (:146-154,213-217), and GateLoop
    layers (:152,221-222)."""
    dim: int
    depth: int
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    qk_norm: bool = True
    qk_norm_scale: float = 10.0
    rope_theta: float = 50000.0
    cond_dim: Optional[int] = None
    num_register_tokens: int = 0
    use_unet_skip_connection: bool = False
    skip_connect_scale: Optional[float] = None
    use_gateloop_layers: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    attn_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, time_emb, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        if self.use_unet_skip_connection:
            assert self.depth % 2 == 0, (
                "u-net skip connections need an even depth "
                "(reference: transformer.py:130)")
        b, n = x.shape[0], x.shape[1]
        r = self.num_register_tokens
        cond_dim = self.cond_dim or self.dim

        if r > 0:
            reg = self.param("register_tokens",
                             nn.initializers.normal(stddev=1.0), (r, self.dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(reg, (b, r, self.dim)).astype(x.dtype), x],
                axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (r, 0)), constant_values=True)
            positions = np.concatenate(
                [np.full((r,), -10000.0), np.arange(n, dtype=np.float64)])
            rotary = rotary_freqs(n + r, self.dim_head, self.rope_theta,
                                  positions=positions)
        else:
            rotary = rotary_freqs(n, self.dim_head, self.rope_theta)

        skip_scale = (self.skip_connect_scale if self.skip_connect_scale
                      is not None else 2.0 ** -0.5)
        skips = []
        for i in range(self.depth):
            has_skip = self.use_unet_skip_connection and (i + 1) > self.depth // 2
            if self.use_unet_skip_connection and not has_skip:
                skips.append(x)
            elif has_skip:
                skip = skips.pop() * skip_scale
                x = nn.Dense(self.dim, name=f"layers_{i}_skip_combiner",
                             dtype=self.dtype)(
                    jnp.concatenate([x, skip], axis=-1))

            if self.use_gateloop_layers:
                x = GateLoop(self.dim, dtype=self.dtype,
                             name=f"layers_{i}_gateloop")(x) + x

            attn_in = AdaptiveRMSNorm(self.dim, cond_dim, name=f"layers_{i}_attn_norm")(
                x, cond=time_emb)
            x = Attention(
                self.dim, self.heads, self.dim_head, self.qk_norm,
                self.qk_norm_scale, self.attn_dropout,
                use_flash=self.attn_flash, dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(attn_in, rotary=rotary, mask=mask,
              deterministic=deterministic) + x
            ff_in = AdaptiveRMSNorm(self.dim, cond_dim, name=f"layers_{i}_ff_norm")(
                x, cond=time_emb)
            x = FeedForward(self.dim, self.ff_mult, self.ff_dropout,
                            dtype=self.dtype, name=f"layers_{i}_ff")(
                ff_in, deterministic=deterministic) + x

        if r > 0:
            x = x[:, r:]
        return RMSNorm(self.dim, name="final_norm")(x)


class ConvPositionEmbed(nn.Module):
    """Depthwise conv positional embedding, kernel 31 + exact GELU
    (reference: transformer.py:16-46)."""
    dim: int
    kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        assert self.kernel_size % 2 == 1
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        # depthwise conv over time, feature-last layout [B, T, C]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.dim))  # HIO with feature groups = dim
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1,),
            padding=[(self.kernel_size // 2, self.kernel_size // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.dim,
        ) + b
        y = gelu_exact(y.astype(jnp.float32)).astype(x.dtype)
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0.0)
        return y


class LearnedSinusoidalPosEmb(nn.Module):
    """Random learned Fourier features of the scalar ODE time
    (reference: pos_emb.py:14-26)."""
    dim: int

    @nn.compact
    def __call__(self, t):  # t: [B]
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(stddev=1.0), (half,))
        freqs = t[:, None].astype(jnp.float32) * w[None, :] * (2 * np.pi)
        return jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
