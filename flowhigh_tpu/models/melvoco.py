"""Mel codec: waveform -> 256-band log-mel, and mel -> waveform via BigVGAN.

Functional re-design of the reference MelVoco
(reference: src/flowhigh/models/melvoco.py:16-122): encode is a pure jittable
function of the (static) mel config — reflect pad (n_fft-hop)/2, center=False
STFT, sqrt(re^2+im^2+1e-9) magnitude, Slaney mel matmul, log-clamp 1e-5 — and
decode applies the frozen BigVGAN generator params.

``encode_torchaudio`` is the reference's alternative encode path
(reference: melvoco.py:88-112) — dead in the reference's own pipeline
(nothing ever calls it) but part of the public MelVoco surface: a
*power* spectrogram (torchaudio ``T.Spectrogram`` defaults: center=True,
power=2) through an HTK/unnormalized mel bank (``T.MelScale`` defaults)
with ``AmplitudeToDB``-style 10*log10 compression when ``log`` is set.
Note its mel output is NOT interchangeable with ``encode``'s (different
mel scale, normalization, and compression) — true of the reference too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MelConfig, VocoderConfig
from ..dsp import apply_mel, log_compress, mel_filterbank, stft_magnitude
from ..dsp.mel import mel_filterbank_htk
from ..dsp.stft import stft
from .bigvgan import BigVGAN


def encode(audio: jax.Array, cfg: MelConfig = MelConfig()) -> jax.Array:
    """[B, T] in [-1, 1] -> [B, frames, n_mels] log-mel
    (reference: melvoco.py:56-86)."""
    mag = stft_magnitude(
        audio, cfg.n_fft, cfg.hop_length, cfg.win_length,
        center=False, pad_mode="reflect", eps=1e-9,
    )  # [B, bins, frames]
    basis = mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.n_mels,
                           cfg.f_min, cfg.f_max)
    mel = apply_mel(mag, basis)
    mel = log_compress(mel, 1e-5)
    return jnp.swapaxes(mel, -1, -2)  # [B, frames, n_mels]


def encode_torchaudio(audio: jax.Array, cfg: MelConfig = MelConfig(),
                      log: bool = True) -> jax.Array:
    """[B, T] -> [B, frames, n_mels]: the reference's alternative encode
    (reference: melvoco.py:88-112). torchaudio-default math: center=True
    reflect-padded STFT, |z|^2 power spectrum, HTK mel bank with f_min=0
    and no normalization, then AmplitudeToDB on power (10*log10, amin
    1e-10, no top_db) when ``log``."""
    spec = stft(audio, cfg.n_fft, cfg.hop_length, cfg.win_length,
                center=True, pad_mode="reflect")  # [B, bins, frames]
    power = spec.real**2 + spec.imag**2
    basis = mel_filterbank_htk(cfg.sampling_rate, cfg.n_fft, cfg.n_mels,
                               0.0, cfg.f_max)
    mel = apply_mel(power, basis)
    if log:
        mel = 10.0 * jnp.log10(jnp.clip(mel, min=1e-10))
    return jnp.swapaxes(mel, -1, -2)


class MelVoco:
    """Thin stateful wrapper pairing the encode config with vocoder params.

    Mirrors the reference's MelVoco surface (n_mels/sampling_rate/hop_length/
    win_length attributes, encode/decode/latent_dim) while keeping the actual
    compute functional so it jits and shards cleanly.
    """

    def __init__(self, mel_cfg: MelConfig = None,
                 voc_cfg: VocoderConfig = None,
                 vocoder_params=None, dtype=jnp.float32, fused_act: bool = False,
                 packed: bool = False, conv_dtype=None,
                 pallas_convs: bool = False, storage_dtype=None,
                 fuse_act_conv=False,  # False | True | "auto"
                 kernel_pipeline: int = 1,
                 *,
                 # reference constructor surface (melvoco.py:17-31)
                 n_mels=None, sampling_rate=None, f_max=None, f_min=None,
                 n_fft=None, win_length=None, hop_length=None,
                 vocoder="bigvgan", vocoder_config=None, vocoder_path=None,
                 log=True):
        if mel_cfg is None:
            base = MelConfig()
            mel_cfg = MelConfig(
                n_mels=n_mels or base.n_mels,
                sampling_rate=sampling_rate or base.sampling_rate,
                f_max=f_max or base.f_max,
                f_min=f_min or base.f_min,
                n_fft=n_fft or base.n_fft,
                win_length=win_length or base.win_length,
                hop_length=hop_length or base.hop_length,
            )
        assert vocoder == "bigvgan", "unsuitable vocoder name"
        if voc_cfg is None:
            if vocoder_config is not None:
                voc_cfg = VocoderConfig.from_json(vocoder_config)
            else:
                voc_cfg = VocoderConfig()
        if vocoder_params is None and vocoder_path is not None:
            from ..compat.torch_ckpt import map_vocoder_state_dict
            import torch
            pkg = torch.load(vocoder_path, map_location="cpu", weights_only=True)
            vocoder_params = map_vocoder_state_dict(pkg.get("generator", pkg),
                                                    voc_cfg)
        self.mel_cfg = mel_cfg
        self.log = log
        self.voc_cfg = voc_cfg
        self.vocoder = BigVGAN(voc_cfg, dtype=dtype, fused_act=fused_act,
                               packed=packed, conv_dtype=conv_dtype,
                               pallas_convs=pallas_convs,
                               storage_dtype=storage_dtype,
                               fuse_act_conv=fuse_act_conv,
                               kernel_pipeline=kernel_pipeline)
        self.vocoder_params = vocoder_params

    # reference attribute surface (melvoco.py:17-54)
    @property
    def n_mels(self):
        return self.mel_cfg.n_mels

    @property
    def sampling_rate(self):
        return self.mel_cfg.sampling_rate

    @property
    def hop_length(self):
        return self.mel_cfg.hop_length

    @property
    def win_length(self):
        return self.mel_cfg.win_length

    @property
    def latent_dim(self):
        return self.mel_cfg.n_mels

    def init_vocoder_params(self, rng, frames: int = 16):
        mel = jnp.zeros((1, frames, self.voc_cfg.num_mels))
        self.vocoder_params = self.vocoder.init(rng, mel)
        return self.vocoder_params

    def encode(self, audio: jax.Array) -> jax.Array:
        return encode(audio, self.mel_cfg)

    def encode_torchaudio(self, audio: jax.Array) -> jax.Array:
        return encode_torchaudio(audio, self.mel_cfg, log=self.log)

    def decode(self, mel: jax.Array) -> jax.Array:
        """[B, frames, n_mels] -> [B, frames * hop] waveform
        (reference: melvoco.py:114-121)."""
        assert self.vocoder_params is not None, "vocoder params not loaded"
        return self.vocoder.apply(self.vocoder_params, mel)
