"""1-D ConvNeXt alternative backbone (reference: src/flowhigh/models/convnext.py).

Feature-last [B, T, C] layout throughout (no transposes — the reference's
torch code flips between [B,C,T] and [B,T,C]; on TPU we keep channels in the
lane dimension and let the depthwise conv run in NHC directly).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .transformer import gelu_exact


class AdaLayerNorm(nn.Module):
    """LayerNorm with time-conditioned scale/shift, identity at init
    (reference: convnext.py:63-93)."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond):
        scale = nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones, name="scale")(cond)
        shift = nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, name="shift")(cond)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * scale[:, None, :] + shift[:, None, :]).astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    """Depthwise conv k=7 -> AdaLN -> pointwise MLP -> layer scale -> residual
    (reference: convnext.py:9-61)."""
    dim: int
    intermediate_dim: int
    layer_scale_init_value: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, cond):  # x: [B, T, C]
        residual = x
        w = self.param("dwconv_kernel", nn.initializers.lecun_normal(), (7, 1, self.dim))
        b = self.param("dwconv_bias", nn.initializers.zeros, (self.dim,))
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1,), [(3, 3)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=self.dim,
        ) + b
        x = AdaLayerNorm(self.dim, name="norm")(x, cond)
        x = nn.Dense(self.intermediate_dim, name="pwconv1", dtype=self.dtype)(x)
        x = gelu_exact(x.astype(jnp.float32)).astype(self.dtype)
        x = nn.Dense(self.dim, name="pwconv2", dtype=self.dtype)(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,))
            x = x * gamma
        return residual + x


class ConvNeXtBackbone(nn.Module):
    """8-layer ConvNeXt stack + final LayerNorm
    (reference: src/flowhigh/models/flow.py:124-139, 247-253)."""
    dim: int
    num_layers: int = 8
    mult: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, time_emb, mask=None):
        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                self.dim, self.dim * self.mult, 1.0, dtype=self.dtype,
                name=f"blocks_{i}")(x, cond=time_emb)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
        scale = self.param("final_norm_scale", nn.initializers.ones, (self.dim,))
        bias = self.param("final_norm_bias", nn.initializers.zeros, (self.dim,))
        return (y * scale + bias).astype(x.dtype)
