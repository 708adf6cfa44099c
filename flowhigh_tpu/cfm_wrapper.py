"""Reference-shaped mid-level API: FLowHigh + ConditionalFlowMatcherWrapper.

Drop-in-shaped equivalents of the reference's model-level surface
(reference: src/flowhigh/models/flow.py:54-75 constructor kwargs and
src/flowhigh/cfm_superresolution.py:94-527 wrapper methods), so code written
against the reference maps one-to-one. These wrap the functional JAX core —
``FLowHigh`` bundles a VectorFieldNet with its config/params/codec, and the
wrapper exposes ``sample`` / ``forward`` (training loss) / ``load``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from .cfm import (cfm_training_loss, mel_cutoff_bins, mel_replace,
                  odeint_fixed, sample_prior)
from .config import CFMConfig, ModelConfig
from .models import MelVoco, VectorFieldNet, forward_with_cond_scale
from .models.melvoco import encode as _encode
from .sr import _is_probably_audio


def _resample_to(wav: jax.Array, in_sr: int, out_sr: int) -> jax.Array:
    """On-device polyphase resample [B, T] raw audio between integer rates
    (reference: cfm_superresolution.py:317-323 uses torchaudio resample).
    resample_poly reduces the up/down fraction itself."""
    from .dsp.resample import resample_poly
    return resample_poly(wav, out_sr, in_sr)


class FLowHigh:
    """Reference-kwarg model container (reference: flow.py:55-75)."""

    def __init__(
        self,
        *,
        audio_enc_dec: Optional[MelVoco] = None,
        dim_in: Optional[int] = None,
        dim_cond_emb: int = 0,
        dim: int = 1024,
        depth: int = 24,
        dim_head: int = 64,
        heads: int = 16,
        ff_mult: int = 4,
        ff_dropout: float = 0.0,
        time_hidden_dim: Optional[int] = None,
        conv_pos_embed_kernel_size: int = 31,
        conv_pos_embed_groups: Optional[int] = None,
        attn_dropout: float = 0.0,
        attn_flash: bool = False,
        attn_qk_norm: bool = True,
        use_gateloop_layers: bool = False,
        architecture: str = "transformer",
        num_register_tokens: int = 0,
        use_unet_skip_connection: bool = False,
        skip_connect_scale: Optional[float] = None,
        params=None,
    ):
        # full reference constructor surface (flow.py:55-75). Options the
        # published configs never set and this build deliberately does not
        # carry raise loudly instead of being silently dropped:
        if dim_cond_emb != 0:
            raise NotImplementedError(
                "dim_cond_emb != 0 is accepted by the reference constructor "
                "but never fed by any reference code path; unsupported here")
        if time_hidden_dim is not None and time_hidden_dim != dim:
            raise NotImplementedError(
                "time_hidden_dim defaults to dim (flow.py:81-84); other "
                "values are not supported")
        if conv_pos_embed_groups is not None and conv_pos_embed_groups != dim:
            raise NotImplementedError(
                "conv_pos_embed_groups defaults to dim (depthwise); other "
                "values are not supported")
        self.audio_enc_dec = audio_enc_dec
        self.config = ModelConfig(
            architecture=architecture,
            dim_in=dim_in if dim_in is not None else dim,
            dim=dim, depth=depth, heads=heads, dim_head=dim_head,
            ff_mult=ff_mult,
            conv_pos_embed_kernel_size=conv_pos_embed_kernel_size,
            attn_qk_norm=attn_qk_norm,
            attn_flash=attn_flash,
            ff_dropout=ff_dropout,
            attn_dropout=attn_dropout,
            num_register_tokens=num_register_tokens,
            use_unet_skip_connection=use_unet_skip_connection,
            skip_connect_scale=skip_connect_scale,
            use_gateloop_layers=use_gateloop_layers,
        )
        self.net = VectorFieldNet(self.config)
        self.params = params

    def init_params(self, rng: jax.Array):
        mel = jnp.zeros((1, 8, self.config.dim_in))
        self.params = self.net.init(rng, mel, times=jnp.zeros(()), cond=mel)
        return self.params

    def __call__(self, x, *, times, cond, cond_drop_mask=None, mask=None,
                 train=False, rngs=None):
        return self.net.apply(self.params, x, times=times, cond=cond,
                              cond_drop_mask=cond_drop_mask, mask=mask,
                              train=train, rngs=rngs)


class ConditionalFlowMatcherWrapper:
    """(reference: cfm_superresolution.py:94-527). ``ode_atol``/``rtol``/
    ``use_torchode`` are accepted for signature parity; the fixed-grid
    euler/midpoint solvers are exact on the reference's sampling grid."""

    def __init__(
        self,
        flowhigh: FLowHigh,
        sigma: float = 0.0,
        ode_atol: float = 1e-5,
        ode_rtol: float = 1e-5,
        use_torchode: bool = False,
        cfm_method: str = "basic_cfm",
        torchdiffeq_ode_method: str = "midpoint",
        torchode_method_klass=None,
        cond_drop_prob: float = 0.0,
        ode_tableau: Optional[str] = None,
    ):
        del torchode_method_klass
        self.flowhigh = flowhigh
        self.sigma = sigma
        self.cfm_method = cfm_method
        self.ode_method = torchdiffeq_ode_method
        self.cond_drop_prob = cond_drop_prob
        self.use_adaptive = use_torchode  # adaptive solver instead of fixed grid
        self.ode_atol = ode_atol
        self.ode_rtol = ode_rtol
        # the reference's torchode path is Tsit5 (cfm_superresolution.py:
        # 259-276) — match the named solver when the reference flag is used
        self.ode_tableau = ode_tableau or ("tsit5" if use_torchode
                                           else "dopri5")

    def _mel_cfg(self):
        enc = self.flowhigh.audio_enc_dec
        assert enc is not None, "audio_enc_dec must be set"
        return enc.mel_cfg

    def sample(
        self,
        *,
        cond=None,
        cond_mask=None,
        time_steps: int = 4,
        cond_scale: float = 1.0,
        decode_to_audio: bool = True,
        std_1: Optional[float] = None,
        std_2: Optional[float] = None,
        mel_pp: bool = False,
        cfm_method: Optional[str] = None,
        rng: Optional[jax.Array] = None,
    ):
        """(reference: cfm_superresolution.py:162-284)."""
        if cfm_method not in CFMConfig.CFM_METHODS:
            cfm_method = self.cfm_method
        if cfm_method != "basic_cfm" and (std_1 is None or std_2 is None):
            std_1, std_2 = 1.0, self.sigma
        if std_1 is None:
            std_1, std_2 = 1.0, 0.0
        if rng is None:
            rng = jax.random.PRNGKey(0)

        cond = jnp.asarray(cond)
        if _is_probably_audio(cond):
            cond = _encode(cond.reshape(cond.shape[0], -1), self._mel_cfg())

        cutoff = mel_cutoff_bins(cond)
        y0 = sample_prior(rng, cfm_method, cond, float(std_1), float(std_2),
                          cutoff)

        fh = self.flowhigh

        def ode_fn(t, x):
            return forward_with_cond_scale(
                fh.net.apply, fh.params, x, times=t, cond=cond,
                cond_scale=cond_scale, mask=cond_mask)

        if self.use_adaptive:
            from .cfm import odeint_adaptive
            from .sr import _warn_if_unconverged
            sampled, stats = odeint_adaptive(
                ode_fn, y0, self.ode_atol, self.ode_rtol, return_stats=True,
                tableau=self.ode_tableau)
            _warn_if_unconverged(stats)
        else:
            sampled = odeint_fixed(ode_fn, y0, time_steps, self.ode_method)
        if mel_pp:
            sampled = mel_replace(sampled, cond, cutoff)
        if not decode_to_audio or fh.audio_enc_dec is None:
            return sampled
        return fh.audio_enc_dec.decode(sampled)

    def forward(
        self,
        x1,
        *,
        cond=None,
        cond_lengths=None,
        mask=None,
        cond_mask=None,
        input_sampling_rate=None,
        cond_freq_masking: bool = False,
        random_sr=None,
        weighted_loss: bool = False,
        cfm_method: Optional[str] = None,
        rng: Optional[jax.Array] = None,
    ):
        """Training loss (reference: cfm_superresolution.py:287-527).

        ``input_sampling_rate``: raw-audio inputs at a rate other than the
        codec's are polyphase-resampled on device before encoding
        (reference: :309-323 via torchaudio resample). ``random_sr`` is
        accepted for signature parity and unused, exactly like the reference
        (flow.py:191 receives it and never reads it). ``mask``/``cond_mask``
        are accepted for signature parity but IGNORED: the segment crop
        rebuilds validity from ``cond_lengths`` (reference: :470-507), which
        is the supported masking input — a caller-supplied attention mask
        could not survive the random crop anyway."""
        del cond_mask, random_sr
        if cfm_method not in CFMConfig.CFM_METHODS:
            cfm_method = self.cfm_method
        if rng is None:
            rng = jax.random.PRNGKey(0)

        mel_cfg = self._mel_cfg()
        x1 = jnp.asarray(x1)
        cond = jnp.asarray(cond)
        if _is_probably_audio(x1) or _is_probably_audio(cond):
            codec_sr = mel_cfg.sampling_rate
            in_sr = int(input_sampling_rate or codec_sr)
            if _is_probably_audio(x1):
                x1 = _resample_to(x1.reshape(x1.shape[0], -1), in_sr, codec_sr)
                x1 = _encode(x1, mel_cfg)
            if _is_probably_audio(cond):
                cond = _resample_to(cond.reshape(cond.shape[0], -1),
                                    in_sr, codec_sr)
                cond = _encode(cond, mel_cfg)

        # pad to a common frame count. Deliberate deviation: the reference
        # pads at the FRONT (F.pad(..., (0, 0, max - T, 0)), :325-328) while
        # its validity mask stays start-anchored (sequence_mask over
        # cond_lengths, :470-472) — front-padding misaligns its own mask so
        # the loss covers padding and drops real tail frames. We pad at the
        # END so lengths/masks/crops all describe the data. The branch is
        # near-dead in the reference anyway (both encodes come from
        # equal-length waves in its trainer).
        t = max(x1.shape[1], cond.shape[1])
        if x1.shape[1] != cond.shape[1]:
            # shapes are trace-time static, so this surfaces once per compile:
            # training on mismatched-length mels is NOT bit-comparable to the
            # reference (which front-pads; see comment above)
            import warnings
            warnings.warn(
                f"x1/cond mel lengths differ ({x1.shape[1]} vs "
                f"{cond.shape[1]}): end-padding to {t} (reference would "
                f"front-pad — deliberate deviation, see docstring)",
                stacklevel=2)
        if x1.shape[1] < t:
            x1 = jnp.pad(x1, ((0, 0), (0, t - x1.shape[1]), (0, 0)))
        if cond.shape[1] < t:
            cond = jnp.pad(cond, ((0, 0), (0, t - cond.shape[1]), (0, 0)))
        del mask  # full-length self-attn mask can't survive the segment crop

        if cond_lengths is None:
            mel_lengths = jnp.full((x1.shape[0],), t, jnp.int32)
        else:
            mel_lengths = jnp.clip(jnp.asarray(cond_lengths, jnp.int32), 1, t)

        out_size = 2 * mel_cfg.sampling_rate // mel_cfg.hop_length
        return cfm_training_loss(
            self.flowhigh.net.apply, self.flowhigh.params, rng,
            x1, cond, mel_lengths,
            method=cfm_method, sigma=self.sigma, out_size=out_size,
            cond_drop_prob=self.cond_drop_prob, weighted=weighted_loss,
            cond_freq_masking=cond_freq_masking)

    __call__ = forward

    def load(self, path, strict: bool = True):
        """Load a reference-layout checkpoint package and return it
        (reference: cfm_superresolution.py:125-131)."""
        import torch

        from .compat.torch_ckpt import map_model_state_dict
        path = Path(path)
        assert path.exists()
        pkg = torch.load(str(path), map_location="cpu", weights_only=True)
        self.flowhigh.params = map_model_state_dict(
            pkg["model"], self.flowhigh.config)
        return pkg


def init_bigvgan(vocoder_config, vocoder_path, vocoder_freeze: bool = True):
    """Build + load the BigVGAN generator from its JSON config and torch
    checkpoint (reference: src/flowhigh/models/bigvgan/init_vocoder.py:8-23).
    Returns a MelVoco-compatible (cfg, params) pair."""
    import torch

    from .compat.torch_ckpt import map_vocoder_state_dict
    from .config import VocoderConfig
    del vocoder_freeze  # params are immutable pytrees; nothing to freeze
    cfg = VocoderConfig.from_json(vocoder_config)
    pkg = torch.load(vocoder_path, map_location="cpu", weights_only=True)
    params = map_vocoder_state_dict(pkg.get("generator", pkg), cfg)
    return cfg, params
