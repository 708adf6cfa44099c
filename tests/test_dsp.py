"""DSP golden tests: STFT/iSTFT vs torch, resample_poly/sosfiltfilt vs scipy."""

import numpy as np
import pytest
import scipy.signal as sps
import torch

import jax.numpy as jnp

from flowhigh_tpu.dsp import (
    stft, istft, stft_magnitude, hann_window, resample_poly, output_length,
    mel_filterbank, apply_mel, log_compress, sosfiltfilt, cheby1_sos,
    host_degrade, num_frames,
)


def _torch_stft(x, n_fft=2048, hop=480, win=2048, center=True, pad_mode="constant"):
    xt = torch.from_numpy(x).float()
    if not center:
        pad = (n_fft - hop) // 2
        xt = torch.nn.functional.pad(xt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        xt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=center, pad_mode=pad_mode,
        normalized=False, onesided=True, return_complex=True,
    )
    return spec.numpy()


class TestSTFT:
    def test_melvoco_convention_matches_torch(self, rng):
        # center=False + reflect 784 — the mel frontend convention
        x = rng.standard_normal((2, 48000)).astype(np.float32) * 0.3
        ref = _torch_stft(x, center=False)
        got = np.asarray(stft(jnp.asarray(x), 2048, 480, 2048, center=False, pad_mode="reflect"))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)

    def test_center_constant_matches_torch(self, rng):
        x = rng.standard_normal((1, 24000)).astype(np.float32)
        ref = _torch_stft(x, center=True, pad_mode="constant")
        got = np.asarray(stft(jnp.asarray(x), 2048, 480, 2048, center=True, pad_mode="constant"))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)

    def test_num_frames(self):
        for t in [2048, 48000, 48001, 240000]:
            x = jnp.zeros((1, t))
            s = stft(x, 2048, 480, 2048, center=True, pad_mode="constant")
            assert s.shape[-1] == num_frames(t, 2048, 480, center=True)

    def test_istft_roundtrip_matches_torch(self, rng):
        x = rng.standard_normal((1, 48000)).astype(np.float32)
        spec = _torch_stft(x, center=True, pad_mode="constant")
        ref = torch.istft(
            torch.from_numpy(spec), 2048, hop_length=480, win_length=2048,
            window=torch.hann_window(2048), length=48000,
        ).numpy()
        got = np.asarray(istft(jnp.asarray(spec), 2048, 480, 2048, length=48000))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
        # and it reconstructs the signal
        np.testing.assert_allclose(got[:, 2048:-2048], x[:, 2048:-2048], atol=1e-4)

    def test_istft_tail_when_hop_divides_unevenly(self, rng):
        # regression: a symmetric center-pad trim dropped real tail samples
        # (zero-padded back) whenever hop did not divide the length evenly;
        # torch trims the front pad then cuts to `length`.
        for t_len, n_fft, hop in ((48001, 2048, 480), (48000, 1024, 256),
                                  (12345, 512, 120)):
            x = rng.standard_normal((1, t_len)).astype(np.float32)
            win = torch.hann_window(n_fft)
            spec = torch.stft(torch.from_numpy(x), n_fft, hop, n_fft,
                              window=win, center=True, pad_mode="constant",
                              return_complex=True)
            ref = torch.istft(spec, n_fft, hop, n_fft, window=win,
                              length=t_len).numpy()
            got = np.asarray(istft(jnp.asarray(spec.numpy()), n_fft, hop,
                                   length=t_len))
            np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
            # the tail is real data, not zeros
            np.testing.assert_allclose(got[:, -hop:], x[:, -hop:], atol=1e-4)

    def test_magnitude_eps(self, rng):
        x = rng.standard_normal((1, 9600)).astype(np.float32)
        m = stft_magnitude(jnp.asarray(x), center=False, pad_mode="reflect", eps=1e-9)
        ref = np.abs(_torch_stft(x, center=False))
        np.testing.assert_allclose(np.asarray(m), np.sqrt(ref**2 + 1e-9), atol=2e-3, rtol=1e-3)


class TestResample:
    @pytest.mark.parametrize("sr", [8000, 12000, 16000, 24000, 32000, 44100])
    def test_matches_scipy(self, rng, sr):
        x = rng.standard_normal(sr).astype(np.float64)  # 1 s
        ref = sps.resample_poly(x, 48000, sr)
        got = np.asarray(resample_poly(jnp.asarray(x, dtype=jnp.float32), 48000, sr))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=5e-5)

    def test_downsample_matches_scipy(self, rng):
        x = rng.standard_normal(48000).astype(np.float64)
        ref = sps.resample_poly(x, 16000, 48000)
        got = np.asarray(resample_poly(jnp.asarray(x, dtype=jnp.float32), 16000, 48000))
        np.testing.assert_allclose(got, ref, atol=5e-5)

    def test_output_length(self):
        for n, up, down in [(16000, 3, 1), (12345, 48000, 44100), (100, 2, 3)]:
            assert output_length(n, up, down) == -(-n * up // down)

    def test_batched(self, rng):
        x = rng.standard_normal((3, 8000)).astype(np.float32)
        got = np.asarray(resample_poly(jnp.asarray(x), 6, 1))
        for i in range(3):
            ref = sps.resample_poly(x[i].astype(np.float64), 6, 1)
            np.testing.assert_allclose(got[i], ref, atol=5e-5)


class TestMel:
    def test_filterbank_properties(self):
        fb = mel_filterbank(48000, 2048, 256, 20.0, 24000.0)
        assert fb.shape == (256, 1025)
        assert (fb >= 0).all()
        # every filter has support, and supports are ordered by center freq
        assert (fb.sum(axis=1) > 0).all()
        centers = fb.argmax(axis=1)
        assert (np.diff(centers) >= 0).all()
        # Slaney norm: each filter integrates (over Hz) to ~2/width * area = 1-ish;
        # equivalently amplitude * width/2 * 2/width == const — check peak decay
        assert fb.max() < 0.15

    def test_filterbank_matches_librosa_golden(self):
        # Golden fingerprint of librosa.filters.mel(sr=48000, n_fft=2048,
        # n_mels=256, fmin=20, fmax=24000): checked invariants computed from
        # the documented Slaney formulas (librosa is not installed here).
        fb = mel_filterbank(48000, 2048, 256, 20.0, 24000.0)
        # first filter: triangle between 20 Hz and mel bin 2; peaks near bin 1
        freqs = np.linspace(0, 24000, 1025)
        # mel grid endpoints map back to fmin/fmax exactly
        from flowhigh_tpu.dsp import hz_to_mel, mel_to_hz
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(20.0)), 20.0, rtol=1e-10)
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(24000.0)), 24000.0, rtol=1e-10)
        np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-12)
        # filters tile the [fmin, fmax] band: col-sum > 0 for all bins in band
        in_band = (freqs > 130) & (freqs < 23800)
        assert (fb.sum(axis=0)[in_band] > 0).all()

    def test_apply_and_log(self, rng):
        mag = jnp.asarray(rng.random((2, 1025, 10)).astype(np.float32))
        fb = mel_filterbank()
        mel = apply_mel(mag, fb)
        assert mel.shape == (2, 256, 10)
        ref = fb @ np.asarray(mag[0])
        np.testing.assert_allclose(np.asarray(mel[0]), ref, atol=1e-4)
        lg = log_compress(mel)
        assert np.asarray(lg).min() >= np.log(1e-5) - 1e-6


class TestTorchaudioEncode:
    """The reference's alternative encode path (reference: melvoco.py:88-112)
    vs an independent torch replica of the torchaudio transforms it uses
    (torchaudio itself is not installed here): T.Spectrogram(power=2,
    center=True) -> T.MelScale(htk, norm=None, f_min=0) -> AmplitudeToDB."""

    @staticmethod
    def _fbanks(n_freqs, f_min, f_max, n_mels, sr):
        # torchaudio.functional.melscale_fbanks(mel_scale="htk", norm=None)
        all_freqs = torch.linspace(0, sr // 2, n_freqs, dtype=torch.float64)
        m_pts = torch.linspace(
            2595.0 * np.log10(1.0 + f_min / 700.0),
            2595.0 * np.log10(1.0 + f_max / 700.0), n_mels + 2,
            dtype=torch.float64)
        f_pts = 700.0 * (torch.pow(10.0, m_pts / 2595.0) - 1.0)
        f_diff = f_pts[1:] - f_pts[:-1]
        slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
        down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
        up = slopes[:, 2:] / f_diff[1:]
        zero = torch.zeros(1, dtype=torch.float64)
        return torch.max(zero, torch.min(down, up))  # [n_freqs, n_mels]

    def test_htk_filterbank_matches_replica(self):
        from flowhigh_tpu.dsp.mel import mel_filterbank_htk
        fb = mel_filterbank_htk(48000, 2048, 256, 0.0, 24000.0)
        ref = self._fbanks(1025, 0.0, 24000.0, 256, 48000).numpy().T
        assert fb.shape == (256, 1025)
        np.testing.assert_allclose(fb, ref, atol=1e-6)
        # no Slaney norm: narrow triangles peak at ~1 (wherever a bin lands
        # near a filter center), unlike the Slaney bank's < 0.15
        assert fb.max() > 0.5

    def test_matches_torchaudio_replica(self, rng):
        x = (rng.standard_normal((2, 24000)) * 0.3).astype(np.float32)
        spec = torch.stft(
            torch.from_numpy(x), 2048, hop_length=480, win_length=2048,
            window=torch.hann_window(2048), center=True, pad_mode="reflect",
            normalized=False, onesided=True, return_complex=True)
        power = (spec.abs() ** 2).double()
        fb = self._fbanks(1025, 0.0, 24000.0, 256, 48000)
        mel = torch.matmul(power.transpose(-1, -2), fb)  # [B, frames, mels]
        ref_db = (10.0 * torch.log10(torch.clamp(mel, min=1e-10))).numpy()

        from flowhigh_tpu.models.melvoco import encode_torchaudio
        got = np.asarray(encode_torchaudio(jnp.asarray(x)))
        assert got.shape == ref_db.shape
        np.testing.assert_allclose(got, ref_db, atol=3e-2, rtol=1e-3)

    def test_melvoco_method_and_log_flag(self, rng):
        from flowhigh_tpu.models.melvoco import MelVoco
        x = jnp.asarray((rng.standard_normal((1, 9600)) * 0.1).astype(np.float32))
        voc = MelVoco(log=False)
        lin = np.asarray(voc.encode_torchaudio(x))
        assert lin.shape[-1] == 256 and (lin >= 0).all()
        db = np.asarray(MelVoco().encode_torchaudio(x))
        np.testing.assert_allclose(
            db, 10.0 * np.log10(np.clip(lin, 1e-10, None)), atol=1e-4)


class TestSoxrHQDesign:
    """upsampling_method='librosa' analog: soxr itself is unavailable
    offline, so the design is validated against the soxr HQ *specs*
    (~120 dB image rejection, flat passband to ~0.9 Nyquist) rather than
    tap-level parity (see dsp/resample.py:_design)."""

    def test_passband_flat_and_images_rejected(self):
        from flowhigh_tpu.dsp.resample import resample_poly
        sr_in, up = 16000, 3
        t = np.arange(sr_in) / sr_in
        f0 = 3000.0
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(resample_poly(jnp.asarray(x[None]), up, 1,
                                     design="soxr_hq"))[0]
        spec = np.abs(np.fft.rfft(y[2000:-2000] * np.hanning(len(y) - 4000)))
        freqs = np.fft.rfftfreq(len(y) - 4000, 1 / (sr_in * up))
        tone = spec[np.argmin(np.abs(freqs - f0))]
        # images of a 3 kHz tone under x3 upsampling land at 13/19/29/35 kHz
        img_mask = freqs > 10000
        rejection_db = 20 * np.log10(spec[img_mask].max() / tone)
        assert rejection_db < -100, rejection_db
        # passband amplitude preserved
        assert abs(tone / (0.5 * (len(y) - 4000) * 0.5) - 1.0) < 0.01

    def test_output_length_matches_scipy_grid(self):
        from flowhigh_tpu.dsp.resample import output_length, resample_poly
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 1000)).astype(np.float32))
        for up, down in [(3, 1), (160, 147), (1, 2)]:
            y = resample_poly(x, up, down, design="soxr_hq")
            assert y.shape[-1] == output_length(1000, up, down)

    def test_flowhighsr_librosa_mode(self):
        from flowhigh_tpu import FlowHighSR
        from flowhigh_tpu.config import (FlowHighConfig, ModelConfig,
                                         VocoderConfig)
        import pytest
        cfg = FlowHighConfig().replace(
            model=ModelConfig(dim_in=256, dim=16, depth=2, heads=2, dim_head=4),
            vocoder=VocoderConfig(
                num_mels=256, upsample_initial_channel=16,
                upsample_rates=(8, 5, 4, 3), upsample_kernel_sizes=(16, 10, 8, 6),
                resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))
        with pytest.raises(ValueError):
            FlowHighSR(cfg, upsampling_method="torchaudio")
        sr_sci = FlowHighSR(cfg, ode_method="euler")
        sr_sox = FlowHighSR(cfg, ode_method="euler",
                            upsampling_method="librosa")
        import jax
        sr_sci.init_params(jax.random.PRNGKey(0))
        sr_sox.params = sr_sci.params
        sr_sox.melvoco.vocoder_params = sr_sci.melvoco.vocoder_params
        t = np.arange(16000) / 16000
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        a = sr_sci.generate(x, 16000, timestep=1)
        b = sr_sox.generate(x, 16000, timestep=1)
        assert a.shape == b.shape
        assert float(np.abs(a - b).max()) > 0  # different FIR actually used
        # on a band-limited tone the two FIR designs resample near-identically
        up_sci = np.asarray(resample_poly(jnp.asarray(x[None]), 3, 1))
        up_sox = np.asarray(resample_poly(jnp.asarray(x[None]), 3, 1,
                                          design="soxr_hq"))
        np.testing.assert_allclose(up_sci[:, 200:-200], up_sox[:, 200:-200],
                                   atol=2e-3)


class TestFilters:
    def test_sosfiltfilt_matches_scipy(self, rng):
        x = rng.standard_normal(4000).astype(np.float64) * 0.5
        sos = cheby1_sos(8, 0.05, 0.5)
        ref = sps.sosfiltfilt(sos, x)
        got = np.asarray(sosfiltfilt(sos, jnp.asarray(x, dtype=jnp.float32)))
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_host_degrade_matches_reference_recipe(self, rng):
        wave = rng.standard_normal(48000).astype(np.float64)
        wave /= np.abs(wave).max()
        got = host_degrade(wave, 48000, 16000, order=8, ripple=0.05)
        # replicate the reference recipe inline
        sos = sps.cheby1(8, 0.05, (16000 // 2) / (48000 // 2), btype="lowpass", output="sos")
        d = sps.sosfiltfilt(sos, wave)
        down = sps.resample_poly(d, 16000, 48000)
        up = sps.resample_poly(down, 48000, 16000)
        np.testing.assert_allclose(got, up[: len(wave)], atol=1e-12)
        assert len(got) == len(wave)
