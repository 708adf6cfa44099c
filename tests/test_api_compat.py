"""Reference-shaped API surface: FLowHigh / ConditionalFlowMatcherWrapper /
utils helpers / phase post-processing (SURVEY.md section 9 contract)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flowhigh_tpu import ConditionalFlowMatcherWrapper, FLowHigh
from flowhigh_tpu.config import MelConfig, VocoderConfig
from flowhigh_tpu.models import MelVoco
from flowhigh_tpu.postprocessing import post_process_with_phase
from flowhigh_tpu.utils import (STFTMag, curtail_or_pad, interpolate_1d,
                                mask_from_frac_lengths,
                                mask_from_start_end_indices, sequence_mask,
                                symexp, symlog)


@pytest.fixture(scope="module")
def wrapper():
    voc = MelVoco(MelConfig(), VocoderConfig(
        num_mels=256, upsample_initial_channel=16,
        upsample_rates=(8, 5, 4, 3), upsample_kernel_sizes=(16, 10, 8, 6),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))
    voc.init_vocoder_params(jax.random.PRNGKey(1))
    fh = FLowHigh(dim_in=256, audio_enc_dec=voc, dim=32, depth=2,
                  dim_head=8, heads=2)
    fh.init_params(jax.random.PRNGKey(0))
    return ConditionalFlowMatcherWrapper(
        fh, sigma=1e-4, cfm_method="independent_cfm_adaptive",
        torchdiffeq_ode_method="euler")


class TestWrapper:
    def test_sample_from_mel(self, wrapper, rng):
        cond = jnp.asarray(rng.standard_normal((1, 30, 256)).astype(np.float32))
        mel = wrapper.sample(cond=cond, time_steps=2, decode_to_audio=False)
        assert mel.shape == (1, 30, 256)

    def test_sample_from_raw_audio_decodes(self, wrapper, rng):
        cond = jnp.asarray((rng.standard_normal((1, 9600)) * 0.3).astype(np.float32))
        wav = wrapper.sample(cond=cond, time_steps=1)
        assert wav.ndim == 2 and wav.shape[1] > 8000

    def test_forward_training_loss(self, wrapper, rng):
        x1 = jnp.asarray((rng.standard_normal((2, 24000)) * 0.3).astype(np.float32))
        cond = jnp.asarray((rng.standard_normal((2, 24000)) * 0.3).astype(np.float32))
        loss = wrapper.forward(x1, cond=cond, rng=jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))

    def test_forward_input_sampling_rate(self, wrapper, rng):
        """Raw audio at 16 kHz with input_sampling_rate=16000 must match
        pre-resampling to the codec rate by hand (reference resamples before
        encode, cfm_superresolution.py:309-323)."""
        from flowhigh_tpu.dsp.resample import resample_poly
        key = jax.random.PRNGKey(7)
        x1_16k = jnp.asarray(
            (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32))
        cond_16k = jnp.asarray(
            (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32))
        loss_a = wrapper.forward(x1_16k, cond=cond_16k,
                                 input_sampling_rate=16000, rng=key)
        loss_b = wrapper.forward(resample_poly(x1_16k, 3, 1),
                                 cond=resample_poly(cond_16k, 3, 1), rng=key)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
        # without the kwarg the 16 kHz audio is treated as codec-rate: the
        # mel sequence is 3x shorter and the loss genuinely differs
        loss_c = wrapper.forward(x1_16k, cond=cond_16k, rng=key)
        assert abs(float(loss_c) - float(loss_a)) > 1e-6

    def test_forward_cond_freq_masking_changes_loss(self, wrapper, rng):
        x1 = jnp.asarray((rng.standard_normal((2, 24000)) * 0.3).astype(np.float32))
        cond = jnp.asarray((rng.standard_normal((2, 24000)) * 0.3).astype(np.float32))
        key = jax.random.PRNGKey(3)
        l0 = wrapper.forward(x1, cond=cond, rng=key)
        l1 = wrapper.forward(x1, cond=cond, rng=key, cond_freq_masking=True)
        assert np.isfinite(float(l1))
        assert float(l0) != float(l1)
        # random_sr is accepted for signature parity (and unused, like the
        # reference flow.py:191)
        l2 = wrapper.forward(x1, cond=cond, rng=key,
                             random_sr=[8000, 16000])
        np.testing.assert_allclose(float(l0), float(l2), rtol=0)

    def test_load_reference_layout(self, wrapper, tmp_path):
        from flowhigh_tpu.compat import params_to_torch_state
        sd = params_to_torch_state(wrapper.flowhigh.params,
                                   wrapper.flowhigh.config)
        pkg = {"model": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               "optim": {}, "scheduler": {}}
        torch.save(pkg, tmp_path / "ckpt.pt")
        before = jax.tree.leaves(wrapper.flowhigh.params)
        wrapper.load(tmp_path / "ckpt.pt")
        after = jax.tree.leaves(wrapper.flowhigh.params)
        for a, b in zip(before, after):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


class TestUtils:
    def test_sequence_mask(self):
        m = sequence_mask(jnp.array([2, 4]), 5)
        assert m.shape == (2, 5)
        assert m.tolist() == [[True, True, False, False, False],
                              [True, True, True, True, False]]

    def test_interpolate_1d_matches_torch(self, rng):
        x = rng.standard_normal((2, 3, 10)).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x)[..., None], (25, 1), mode="bilinear"
        )[..., 0].numpy()
        got = np.asarray(interpolate_1d(jnp.asarray(x), 25))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_curtail_or_pad(self, rng):
        x = jnp.ones((1, 5, 3))
        assert curtail_or_pad(x, 3).shape == (1, 3, 3)
        y = curtail_or_pad(x, 8)
        assert y.shape == (1, 8, 3) and float(y[0, -1].sum()) == 0

    def test_masks(self):
        m = mask_from_start_end_indices(6, jnp.array([1]), jnp.array([4]))
        assert m.tolist() == [[False, True, True, True, False, False]]
        m2 = mask_from_frac_lengths(jax.random.PRNGKey(0), 10,
                                    jnp.array([0.5, 0.3]))
        assert m2.shape == (2, 10)
        assert int(m2[0].sum()) == 5 and int(m2[1].sum()) == 3

    def test_symlog_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal(100).astype(np.float32) * 10)
        np.testing.assert_allclose(np.asarray(symexp(symlog(x))), np.asarray(x),
                                   rtol=1e-4, atol=1e-4)

    def test_stftmag(self, rng):
        x = jnp.asarray(rng.standard_normal(4800).astype(np.float32))
        m = STFTMag()(x)
        assert m.shape[1] == 1025


class TestPhasePostProcess:
    def test_runs_and_preserves_low_band(self, rng):
        n = np.arange(24000) / 48000
        src = np.sin(2 * np.pi * 500 * n).astype(np.float32)
        pred = (np.sin(2 * np.pi * 500 * n) * 0.9
                + 0.2 * np.sin(2 * np.pi * 15000 * n)).astype(np.float32)
        out = np.asarray(post_process_with_phase(
            jnp.asarray(pred)[None], jnp.asarray(src)[None], 24000))
        assert out.shape == (1, 24000)
        assert np.isfinite(out).all()
        c = np.corrcoef(out[0, 2048:-2048], src[2048:-2048])[0, 1]
        assert abs(c) > 0.8


class TestReferenceConfigLoading:
    def test_loads_actual_reference_config(self):
        from flowhigh_tpu.config import FlowHighConfig
        import pathlib
        ref = pathlib.Path("/root/reference/configs/config.json")
        if not ref.exists():
            pytest.skip("reference not mounted")
        cfg = FlowHighConfig.from_reference_json(ref)
        # values pinned by the reference config (configs/config.json:1-45)
        assert cfg.mel.sampling_rate == 48000
        assert cfg.mel.n_fft == 2048 and cfg.mel.hop_length == 480
        assert cfg.mel.n_mels == 256
        assert cfg.mel.f_min == 20 and cfg.mel.f_max == 24000
        assert cfg.model.architecture == "transformer"
        assert cfg.model.dim == 1024 and cfg.model.depth == 2
        assert cfg.model.heads == 16 and cfg.model.dim_head == 64
        assert cfg.cfm.cfm_method == "independent_cfm_adaptive"
        assert cfg.cfm.sigma == pytest.approx(1e-4)
        assert cfg.train.batch_size == 128
        assert cfg.train.lr == pytest.approx(3e-4)
        assert cfg.train.num_train_steps == 400001
        assert cfg.data.downsample_min == 4000
        assert cfg.data.downsample_max == 32000
        assert cfg.train.random_seed == 104


class TestMelBinHelpers:
    def test_mel_bin_index_matches_reference_formula(self):
        from flowhigh_tpu.utils import hz_to_mel_htk, mel_bin_index
        np.testing.assert_allclose(hz_to_mel_htk(700.0),
                                   2595 * np.log10(2), rtol=1e-12)
        assert mel_bin_index(0, 48000, 256) == 0
        assert mel_bin_index(24000, 48000, 256) == 256
        # 8 kHz cutoff of a 16 kHz source lands mid-scale
        b = mel_bin_index(8000, 48000, 256)
        assert 150 < b < 220
        arr = mel_bin_index(np.array([1000.0, 4000.0]), 48000, 256)
        assert arr.dtype.kind == "i" and arr[0] < arr[1]
