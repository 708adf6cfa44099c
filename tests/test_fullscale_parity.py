"""Full-scale numerical parity (VERDICT round-1 item 5): the torch replica at
REFERENCE scale — vector field dim 1024 / depth 2 / heads 16x64 / 256 mels
(configs/config.json:22-25) and the published BigVGAN 48 kHz 256-band
generator config (upsample_initial_channel 1536, rates (5,4,4,3,2)) — run
end-to-end mel -> euler-step -> waveform against the JAX build through the
checkpoint compat mapper. The toy-size parity tests (test_model_parity.py,
dim 16) bound per-op error; this bounds the ACCUMULATED error at production
width. Measured tolerances are recorded in BASELINE.md.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import torch_ref
from flowhigh_tpu.compat import map_model_state_dict, map_vocoder_state_dict
from flowhigh_tpu.config import ModelConfig, VocoderConfig
from flowhigh_tpu.models import BigVGAN, VectorFieldNet

FULL_MODEL = ModelConfig()        # dim 1024, depth 2, heads 16, dim_head 64
FULL_VOC = VocoderConfig()        # published bigvgan_48khz_256band schema
FRAMES = 12                       # 12 mel frames -> 5760 samples @ 48 kHz


@pytest.fixture(scope="module")
def full_torch_net():
    torch.manual_seed(0)
    return torch_ref.TorchFLowHigh(
        dim_in=FULL_MODEL.dim_in, dim=FULL_MODEL.dim, depth=FULL_MODEL.depth,
        dim_head=FULL_MODEL.dim_head, heads=FULL_MODEL.heads).eval()


@pytest.fixture(scope="module")
def full_torch_voc():
    torch.manual_seed(1)
    tnet = torch_ref.TorchBigVGAN(FULL_VOC).eval()
    with torch.no_grad():  # snake params off the trivial init point
        for n, p in tnet.named_parameters():
            if "alpha" in n or "beta" in n:
                p.copy_(torch.randn_like(p) * 0.3)
    return tnet


class TestFullScaleParity:
    def test_vector_field_at_reference_scale(self, full_torch_net, rng):
        net = VectorFieldNet(FULL_MODEL)
        sd = {"flowhigh." + k: v for k, v in full_torch_net.state_dict().items()}
        params = map_model_state_dict(sd, FULL_MODEL)

        x = rng.standard_normal((1, FRAMES, 256)).astype(np.float32)
        cond = rng.standard_normal((1, FRAMES, 256)).astype(np.float32)
        times = np.array([0.4], dtype=np.float32)
        with torch.no_grad():
            ref = full_torch_net(torch.from_numpy(x), torch.from_numpy(times),
                                 torch.from_numpy(cond)).numpy()
        got = np.asarray(net.apply(params, jnp.asarray(x),
                                   times=jnp.asarray(times),
                                   cond=jnp.asarray(cond)))
        diff = np.abs(got - ref).max()
        print(f"\n[fullscale] vector-field max|diff| = {diff:.3e}")
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_mel_to_waveform_at_reference_scale(self, full_torch_net,
                                                full_torch_voc, rng):
        """End-to-end: mel -> one euler CFM step -> full 1536-channel BigVGAN
        -> waveform, torch vs jax through the compat mapper."""
        net = VectorFieldNet(FULL_MODEL)
        sd = {"flowhigh." + k: v for k, v in full_torch_net.state_dict().items()}
        params = map_model_state_dict(sd, FULL_MODEL)
        voc_sd = torch_ref.torch_state_dict_weight_normed(full_torch_voc)
        voc_params = map_vocoder_state_dict(voc_sd, FULL_VOC)
        jvoc = BigVGAN(FULL_VOC)

        cond = (rng.standard_normal((1, FRAMES, 256)) * 0.5).astype(np.float32)
        y0 = rng.standard_normal((1, FRAMES, 256)).astype(np.float32)
        t0 = np.zeros((1,), np.float32)

        # torch: euler step y1 = y0 + 1.0 * v(0, y0), then vocoder
        with torch.no_grad():
            v = full_torch_net(torch.from_numpy(y0), torch.from_numpy(t0),
                               torch.from_numpy(cond))
            y1_t = torch.from_numpy(y0) + v
            wav_ref = full_torch_voc(y1_t.transpose(1, 2)).numpy()[:, 0, :]

        v_j = net.apply(params, jnp.asarray(y0), times=jnp.asarray(t0),
                        cond=jnp.asarray(cond))
        y1_j = jnp.asarray(y0) + v_j
        wav_got = np.asarray(jvoc.apply(voc_params, y1_j))

        assert wav_got.shape == wav_ref.shape == (1, FRAMES * 480)
        diff = np.abs(wav_got - wav_ref).max()
        denom = np.abs(wav_ref).max()
        print(f"\n[fullscale] waveform max|diff| = {diff:.3e} "
              f"(peak {denom:.3f})")
        np.testing.assert_allclose(wav_got, wav_ref, atol=1e-4, rtol=1e-3)
