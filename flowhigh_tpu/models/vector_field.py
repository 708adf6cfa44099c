"""The trainable CFM vector-field network ("FLowHigh" in the reference).

concat(x_t, cond_mel) -> Dense -> depthwise ConvPositionEmbed residual ->
time-conditioned backbone (transformer | convnext) -> Dense head
(reference: src/flowhigh/models/flow.py:54-261).

Design notes (TPU):
- classifier-free guidance is expressed as a *batched* null branch: when
  cond_scale != 1 at sampling time the conditional and null forwards are
  stacked on the batch axis and run as one compiled call (2x batch beats two
  kernel launches on TPU), then mixed.
- cond dropout at train time uses a traced Bernoulli mask (no python RNG).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .convnext import ConvNeXtBackbone
from .transformer import (
    ConvPositionEmbed,
    LearnedSinusoidalPosEmb,
    Transformer,
    gelu_exact,
)


class VectorFieldNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,               # [B, T, dim_in] — noisy state x_t
        *,
        times: jax.Array,           # [] | [B] — ODE time
        cond: jax.Array,            # [B, T, dim_in] — low-res mel conditioning
        cond_drop_mask: Optional[jax.Array] = None,  # [B] bool, True = drop cond
        mask: Optional[jax.Array] = None,            # [B, T] bool, True = valid
        train: bool = False,   # enables attn/ff dropout (needs 'dropout' rng)
    ) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        b = x.shape[0]

        if times.ndim == 0:
            times = jnp.broadcast_to(times, (b,))

        # learned-zero null conditioning for CFG (reference: flow.py:100,224-230)
        null_cond = self.param("null_cond", nn.initializers.zeros, (cfg.dim_in,))
        if cond_drop_mask is not None:
            cond = jnp.where(cond_drop_mask[:, None, None], null_cond, cond)

        h = jnp.concatenate([x, cond], axis=-1).astype(dtype)
        h = nn.Dense(cfg.dim, name="to_embed", dtype=dtype)(h)
        h = ConvPositionEmbed(
            cfg.dim, cfg.conv_pos_embed_kernel_size, dtype=dtype,
            name="conv_embed")(h, mask=mask) + h

        # time embedding: learned sinusoidal -> Dense -> SiLU (flow.py:92-96)
        t_emb = LearnedSinusoidalPosEmb(cfg.dim, name="sinu_pos_emb")(times)
        t_emb = nn.Dense(cfg.dim, name="time_mlp", dtype=jnp.float32)(t_emb)
        t_emb = jax.nn.silu(t_emb)

        if cfg.architecture == "transformer":
            h = Transformer(
                dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
                dim_head=cfg.dim_head, ff_mult=cfg.ff_mult,
                qk_norm=cfg.attn_qk_norm, qk_norm_scale=cfg.attn_qk_norm_scale,
                rope_theta=cfg.rope_theta, cond_dim=cfg.dim,
                num_register_tokens=cfg.num_register_tokens,
                use_unet_skip_connection=cfg.use_unet_skip_connection,
                skip_connect_scale=cfg.skip_connect_scale,
                use_gateloop_layers=cfg.use_gateloop_layers,
                attn_dropout=cfg.attn_dropout, ff_dropout=cfg.ff_dropout,
                attn_flash=cfg.attn_flash,
                dtype=dtype, name="transformer",
            )(h, time_emb=t_emb, mask=mask, deterministic=not train)
        elif cfg.architecture == "convnext":
            h = ConvNeXtBackbone(
                dim=cfg.dim, num_layers=cfg.convnext_layers, mult=cfg.convnext_mult,
                dtype=dtype, name="convnext",
            )(h, time_emb=t_emb, mask=mask)
        else:
            raise ValueError(f"unknown architecture: {cfg.architecture}")

        out = nn.Dense(cfg.dim_in, use_bias=False, name="to_pred",
                       dtype=jnp.float32)(h.astype(jnp.float32))
        return out


def forward_with_cond_scale(
    apply_fn, params, x, *, times, cond, cond_scale: float = 1.0, mask=None
) -> jax.Array:
    """CFG mixing: null + (cond - null) * scale (reference: flow.py:165-178).

    For cond_scale == 1 this is a single forward. Otherwise the conditional
    and fully-dropped branches are stacked on the batch axis so one compiled
    call serves both.
    """
    if cond_scale == 1.0:
        return apply_fn(params, x, times=times, cond=cond, cond_drop_mask=None,
                        mask=mask)
    b = x.shape[0]
    if times.ndim == 0:
        times = jnp.broadcast_to(times, (b,))
    x2 = jnp.concatenate([x, x], axis=0)
    cond2 = jnp.concatenate([cond, cond], axis=0)
    times2 = jnp.concatenate([times, times], axis=0)
    drop2 = jnp.concatenate(
        [jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0)
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    out = apply_fn(params, x2, times=times2, cond=cond2, cond_drop_mask=drop2,
                   mask=mask2)
    logits, null_logits = out[:b], out[b:]
    return null_logits + (logits - null_logits) * cond_scale
