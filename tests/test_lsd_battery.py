"""LSD regression battery at reference scale (VERDICT r3 next-round #5).

The north-star quality gate — LSD against the published ``ResembleAI/FlowHigh``
checkpoint — is blocked offline (no network egress). This battery is the
tightest offline stand-in: the torch replica (tests/torch_ref.py, the
reference algorithm verbatim) and the JAX build run the SAME solve from the
SAME weights (through the checkpoint compat mapper) with REALISTIC weight
statistics (norm gammas off 1, biases off 0, snake alphas/betas spread —
trained checkpoints live far from lecun-random init), across

    all 4 CFM paths x {euler, midpoint} x both prior semantics (+ a CFG
    cond_scale=2 arm), asserting mel-domain LSD <= 1e-3 dB,

plus a waveform-level LSD through both full-scale BigVGANs (1536-channel,
reference: configs config.json + bigvgan 48khz_256band schema). Absolute
LSDs are recorded in BASELINE.md.

Prior noise is generated ONCE in numpy and injected into both sides, so the
comparison isolates numerics, not RNG streams: 'reference' prior semantics
= y0 = cond (sigma=0 inference default, flowhighsr.py:92 +
cfm_superresolution.py:178-183), 'paper' = y0 = cond + 1.0 * eps.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import torch_ref
from flowhigh_tpu.cfm import mel_cutoff_bins, mel_replace, odeint_fixed
from flowhigh_tpu.compat import map_model_state_dict, map_vocoder_state_dict
from flowhigh_tpu.config import MelConfig, ModelConfig, VocoderConfig
from flowhigh_tpu.metrics import log_spectral_distance
from flowhigh_tpu.models import BigVGAN, VectorFieldNet, mel_encode
from flowhigh_tpu.models.vector_field import forward_with_cond_scale

FULL_MODEL = ModelConfig()   # dim 1024, depth 2, heads 16x64, 256 mels
FULL_VOC = VocoderConfig()   # 1536-channel published 48 kHz/256-band schema
FRAMES = 24
DB = 20.0 / np.log(10.0)     # ln-magnitude -> dB

CFM_PATHS = ("basic_cfm", "independent_cfm_adaptive",
             "independent_cfm_constant", "independent_cfm_mix")


def _realistic_stats(net: torch.nn.Module, seed: int = 7):
    """Push the replica's params toward trained-checkpoint statistics:
    norm gammas ~ N(1, 0.2), biases ~ N(0, 0.05), snake alpha/beta spread
    (random init leaves gammas at 1 and biases at 0 — value ranges a trained
    checkpoint never has, VERDICT r3 'what's missing' #1)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for n, p in net.named_parameters():
            if "alpha" in n or "beta" in n:
                p.copy_(torch.randn(p.shape, generator=g) * 0.5)
            elif n.endswith(".gamma") or "norm" in n.lower() and p.ndim == 1:
                p.copy_(1.0 + torch.randn(p.shape, generator=g) * 0.2)
            elif n.endswith(".bias"):
                p.add_(torch.randn(p.shape, generator=g) * 0.05)
    return net


@pytest.fixture(scope="module")
def nets():
    torch.manual_seed(0)
    tnet = _realistic_stats(torch_ref.TorchFLowHigh(
        dim_in=FULL_MODEL.dim_in, dim=FULL_MODEL.dim,
        depth=FULL_MODEL.depth, dim_head=FULL_MODEL.dim_head,
        heads=FULL_MODEL.heads).eval())
    sd = {"flowhigh." + k: v for k, v in tnet.state_dict().items()}
    params = map_model_state_dict(sd, FULL_MODEL)
    return tnet, VectorFieldNet(FULL_MODEL), params


@pytest.fixture(scope="module")
def vocoders():
    torch.manual_seed(1)
    tvoc = _realistic_stats(torch_ref.TorchBigVGAN(FULL_VOC).eval(), seed=11)
    voc_sd = torch_ref.torch_state_dict_weight_normed(tvoc)
    voc_params = map_vocoder_state_dict(voc_sd, FULL_VOC)
    return tvoc, BigVGAN(FULL_VOC), voc_params


@pytest.fixture(scope="module")
def cond_mel():
    """Synthetic low-res corpus: band-limited chirp + tone stack, mel-encoded
    at the codec config (both sides consume the same mel)."""
    mel_cfg = MelConfig()
    n = FRAMES * mel_cfg.hop_length + mel_cfg.win_length
    t = np.arange(n) / mel_cfg.sampling_rate
    a = np.sin(2 * np.pi * (300 + 2000 * t) * t)
    b = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1320 * t)
    wave = np.stack([a, b]).astype(np.float32)
    mel = np.asarray(mel_encode(jnp.asarray(wave), mel_cfg))[:, :FRAMES, :]
    assert mel.shape == (2, FRAMES, 256)
    return mel


def _torch_solve(tnet, y0, cond, steps, method, cond_scale):
    """Fixed-grid solve with the reference's CFG mixing
    (reference: flow.py:165-178 + cfm_superresolution.py:239-244)."""
    y0 = torch.from_numpy(y0)
    cond_t = torch.from_numpy(cond)
    bsz = y0.shape[0]

    def f(t, y):
        times = torch.full((bsz,), float(t))
        with torch.no_grad():
            v = tnet(y, times, cond_t)
            if cond_scale == 1.0:
                return v
            null = tnet(y, times, cond_t, drop_cond=True)
            return null + (v - null) * cond_scale

    ts = np.linspace(0.0, 1.0, steps + 1)
    y = y0
    for i in range(steps):
        t0, t1 = ts[i], ts[i + 1]
        dt = float(t1 - t0)
        if method == "euler":
            y = y + dt * f(t0, y)
        else:  # midpoint
            k1 = f(t0, y)
            y = y + dt * f(t0 + dt * 0.5, y + dt * 0.5 * k1)
    return y.numpy()


def _jax_solve(jnet, params, y0, cond, steps, method, cond_scale):
    cond_j = jnp.asarray(cond)

    def ode_fn(t, x):
        return forward_with_cond_scale(jnet.apply, params, x, times=t,
                                       cond=cond_j, cond_scale=cond_scale)

    return np.asarray(odeint_fixed(ode_fn, jnp.asarray(y0), steps, method))


def _prior(cfm_method, cond, semantics, rng):
    """Explicit numpy prior per semantics, shared by both sides
    (reference: cfm_superresolution.py:178-183,219-237)."""
    eps = rng.standard_normal(cond.shape).astype(np.float32)
    if cfm_method == "basic_cfm":
        return eps  # pure-noise prior in both semantics
    if semantics == "reference":   # sample() overwrites stds; sigma=0
        return cond.copy()
    y0 = cond + eps                # paper: N(cond, 1)
    if cfm_method == "independent_cfm_mix":
        cutoff = np.asarray(mel_cutoff_bins(jnp.asarray(cond)))
        return np.asarray(mel_replace(jnp.asarray(eps), jnp.asarray(y0),
                                      jnp.asarray(cutoff)))
    return y0


def mel_lsd_db(a: np.ndarray, b: np.ndarray) -> float:
    """RMS dB distance between two log-mel spectrograms (ln magnitudes)."""
    return float(np.sqrt(np.mean((DB * (a - b)) ** 2)))


@pytest.mark.slow
class TestLSDBattery:
    @pytest.mark.parametrize("cfm_method", CFM_PATHS)
    @pytest.mark.parametrize("ode_method", ("euler", "midpoint"))
    @pytest.mark.parametrize("semantics", ("reference", "paper"))
    def test_mel_lsd(self, nets, cond_mel, cfm_method, ode_method, semantics):
        tnet, jnet, params = nets
        rng = np.random.default_rng(0)
        y0 = _prior(cfm_method, cond_mel, semantics, rng)
        ref = _torch_solve(tnet, y0, cond_mel, 2, ode_method, 1.0)
        got = _jax_solve(jnet, params, y0, cond_mel, 2, ode_method, 1.0)
        lsd = mel_lsd_db(got, ref)
        print(f"\n[lsd-battery] {cfm_method}/{ode_method}/{semantics}: "
              f"mel LSD {lsd:.2e} dB, max|diff| {np.abs(got - ref).max():.2e}")
        assert lsd <= 1e-3, lsd

    def test_mel_lsd_cfg_scale(self, nets, cond_mel):
        """CFG arm: cond_scale=2 exercises the null-cond branch + mixing."""
        tnet, jnet, params = nets
        rng = np.random.default_rng(1)
        y0 = _prior("independent_cfm_adaptive", cond_mel, "reference", rng)
        ref = _torch_solve(tnet, y0, cond_mel, 2, "euler", 2.0)
        got = _jax_solve(jnet, params, y0, cond_mel, 2, "euler", 2.0)
        lsd = mel_lsd_db(got, ref)
        print(f"\n[lsd-battery] cfg2/euler: mel LSD {lsd:.2e} dB")
        assert lsd <= 1e-3, lsd

    @pytest.mark.parametrize("cfm_method", CFM_PATHS)
    def test_waveform_lsd(self, nets, vocoders, cond_mel, cfm_method):
        """Solve (euler, reference semantics) then decode through the
        full-scale BigVGANs on each side: waveform LSD <= 1e-3 dB."""
        tnet, jnet, params = nets
        tvoc, jvoc, voc_params = vocoders
        rng = np.random.default_rng(2)
        y0 = _prior(cfm_method, cond_mel, "reference", rng)
        ref_mel = _torch_solve(tnet, y0, cond_mel, 2, "euler", 1.0)
        got_mel = _jax_solve(jnet, params, y0, cond_mel, 2, "euler", 1.0)

        with torch.no_grad():
            wav_ref = tvoc(torch.from_numpy(ref_mel).transpose(1, 2))
        wav_ref = wav_ref.numpy()[:, 0, :]
        wav_got = np.asarray(jvoc.apply(voc_params, jnp.asarray(got_mel)))
        assert wav_got.shape == wav_ref.shape == (2, FRAMES * 480)

        lsd = np.asarray(log_spectral_distance(
            jnp.asarray(wav_ref), jnp.asarray(wav_got),
            n_fft=512, hop_length=128))
        # log_spectral_distance is log10-power: x10 dB
        lsd_db = float(10.0 * lsd.mean())
        print(f"\n[lsd-battery] {cfm_method} waveform LSD {lsd_db:.2e} dB "
              f"(peak {np.abs(wav_ref).max():.3f})")
        assert lsd_db <= 1e-3, lsd_db

    def _solved_pair(self, nets, vocoders, cond_mel):
        """One shared (torch waveform, jax mel) pair for the vocoder-variant
        arms: euler/reference-semantics solve on independent_cfm_adaptive."""
        tnet, jnet, params = nets
        tvoc, _, _ = vocoders
        rng = np.random.default_rng(2)
        y0 = _prior("independent_cfm_adaptive", cond_mel, "reference", rng)
        ref_mel = _torch_solve(tnet, y0, cond_mel, 2, "euler", 1.0)
        got_mel = _jax_solve(jnet, params, y0, cond_mel, 2, "euler", 1.0)
        with torch.no_grad():
            wav_ref = tvoc(torch.from_numpy(ref_mel).transpose(1, 2))
        return wav_ref.numpy()[:, 0, :], got_mel

    @staticmethod
    def _wav_lsd_db(wav_ref, wav_got) -> float:
        lsd = np.asarray(log_spectral_distance(
            jnp.asarray(wav_ref), jnp.asarray(wav_got),
            n_fft=512, hop_length=128))
        return float(10.0 * lsd.mean())

    def test_waveform_lsd_packed_vocoder(self, nets, vocoders, cond_mel):
        """The SERVED vocoder config (packed + Pallas convs + fused units,
        bench.py's fused_vocoder=True) through the same realistic-stats
        battery — closes the packed<->replica realistic-statistics hole
        (VERDICT r4 missing #2): the plain-path arm above never exercises
        ops/packed.py. Interpret mode on CPU, same kernels as TPU."""
        _, _, voc_params = vocoders
        wav_ref, got_mel = self._solved_pair(nets, vocoders, cond_mel)
        jvoc_packed = BigVGAN(FULL_VOC, packed=True, pallas_convs=True,
                              fuse_act_conv=True)
        wav_got = np.asarray(jvoc_packed.apply(voc_params, jnp.asarray(got_mel)))
        assert wav_got.shape == wav_ref.shape
        lsd_db = self._wav_lsd_db(wav_ref, wav_got)
        print(f"\n[lsd-battery] packed/fused vocoder waveform LSD "
              f"{lsd_db:.2e} dB")
        assert lsd_db <= 1e-3, lsd_db

    def test_waveform_lsd_int8_vocoder(self, nets, vocoders, cond_mel):
        """int8 packed-conv dots at realistic weight statistics: the offline
        quality bound for the opt-in vocoder_conv_dtype=int8 serving config
        (VERDICT r4 next-round #1 — the same battery methodology that stands
        in for the blocked checkpoint-LSD gate). The measured LSD is recorded
        in BASELINE.md; the assert pins the order of magnitude so a quant
        regression fails loudly."""
        _, _, voc_params = vocoders
        wav_ref, got_mel = self._solved_pair(nets, vocoders, cond_mel)
        jvoc_i8 = BigVGAN(FULL_VOC, packed=True, pallas_convs=True,
                          fuse_act_conv=True, conv_dtype=jnp.int8)
        wav_got = np.asarray(jvoc_i8.apply(voc_params, jnp.asarray(got_mel)))
        assert wav_got.shape == wav_ref.shape
        assert np.isfinite(wav_got).all()
        lsd_db = self._wav_lsd_db(wav_ref, wav_got)
        print(f"\n[lsd-battery] int8 vocoder waveform LSD {lsd_db:.3f} dB "
              f"(f32 arm is <=1e-3)")
        assert lsd_db <= 1.0, lsd_db
