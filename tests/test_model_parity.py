"""Numerical parity: JAX models vs a torch replica of the reference math,
loaded through the checkpoint compat mapper (so the mapper is tested too)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flowhigh_tpu.compat import map_model_state_dict, map_vocoder_state_dict
from flowhigh_tpu.config import ModelConfig, VocoderConfig
from flowhigh_tpu.models import BigVGAN, VectorFieldNet, forward_with_cond_scale
from flowhigh_tpu.models.bigvgan import upsample1d, downsample1d

import torch_ref


SMALL = dict(dim_in=8, dim=16, depth=2, dim_head=4, heads=2)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = torch_ref.TorchCFMWrapper(**SMALL).eval()
    return net


@pytest.fixture(scope="module")
def jax_net(torch_net):
    cfg = ModelConfig(architecture="transformer", dim_in=8, dim=16, depth=2,
                      dim_head=4, heads=2)
    net = VectorFieldNet(cfg)
    params = map_model_state_dict(torch_net.state_dict(), cfg)
    return net, params


class TestVectorFieldParity:
    def test_forward_matches_torch(self, torch_net, jax_net, rng):
        net, params = jax_net
        x = rng.standard_normal((2, 12, 8)).astype(np.float32)
        cond = rng.standard_normal((2, 12, 8)).astype(np.float32)
        times = np.array([0.3, 0.8], dtype=np.float32)

        with torch.no_grad():
            ref = torch_net.flowhigh(
                torch.from_numpy(x), torch.from_numpy(times), torch.from_numpy(cond)
            ).numpy()
        got = np.asarray(net.apply(params, jnp.asarray(x),
                                   times=jnp.asarray(times), cond=jnp.asarray(cond)))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_null_cond_branch(self, torch_net, jax_net, rng):
        net, params = jax_net
        x = rng.standard_normal((1, 6, 8)).astype(np.float32)
        cond = rng.standard_normal((1, 6, 8)).astype(np.float32)
        times = np.array([0.5], dtype=np.float32)
        with torch.no_grad():
            ref = torch_net.flowhigh(
                torch.from_numpy(x), torch.from_numpy(times), torch.from_numpy(cond),
                drop_cond=True).numpy()
        got = np.asarray(net.apply(
            params, jnp.asarray(x), times=jnp.asarray(times), cond=jnp.asarray(cond),
            cond_drop_mask=jnp.ones((1,), bool)))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_cfg_mixing(self, torch_net, jax_net, rng):
        """cond_scale != 1: null + (cond - null) * scale (flow.py:165-178)."""
        net, params = jax_net
        x = rng.standard_normal((1, 6, 8)).astype(np.float32)
        cond = rng.standard_normal((1, 6, 8)).astype(np.float32)
        times = np.array([0.5], dtype=np.float32)
        with torch.no_grad():
            logits = torch_net.flowhigh(
                torch.from_numpy(x), torch.from_numpy(times), torch.from_numpy(cond))
            null = torch_net.flowhigh(
                torch.from_numpy(x), torch.from_numpy(times), torch.from_numpy(cond),
                drop_cond=True)
            ref = (null + (logits - null) * 2.0).numpy()
        got = np.asarray(forward_with_cond_scale(
            net.apply, params, jnp.asarray(x), times=jnp.asarray(times),
            cond=jnp.asarray(cond), cond_scale=2.0))
        np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)

    def test_scalar_time_broadcast(self, jax_net, rng):
        net, params = jax_net
        x = jnp.asarray(rng.standard_normal((2, 6, 8)).astype(np.float32))
        a = net.apply(params, x, times=jnp.asarray(0.5), cond=x)
        b = net.apply(params, x, times=jnp.full((2,), 0.5), cond=x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


SMALL_VOC = VocoderConfig(
    num_mels=8,
    upsample_initial_channel=32,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock="1",
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
    activation="snakebeta",
    snake_logscale=True,
)


class TestAliasFreeResample:
    def test_upsample_matches_torch(self, rng):
        x = rng.standard_normal((2, 64, 3)).astype(np.float32)
        up = torch_ref.UpSample1d(2, 12)
        with torch.no_grad():
            ref = up(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
        got = np.asarray(upsample1d(jnp.asarray(x), 2, 12))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_downsample_matches_torch(self, rng):
        x = rng.standard_normal((2, 64, 3)).astype(np.float32)
        down = torch_ref.DownSample1d(2, 12)
        with torch.no_grad():
            ref = down(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
        got = np.asarray(downsample1d(jnp.asarray(x), 2, 12))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestConvNeXtParity:
    def test_forward_matches_torch_through_mapper(self, rng):
        """The convnext backbone + its torch->flax mapping
        (compat/torch_ckpt.py:141-162) against a reference-layout torch
        replica (reference convnext.py:9-95, flow.py:124-139,247-253) —
        previously the only mapped architecture without a parity test."""
        torch.manual_seed(0)
        tnet = torch_ref.TorchCFMWrapper(
            dim_in=8, dim=16, architecture="convnext",
            convnext_layers=3).eval()
        # perturb params whose init is deterministic (gamma ones, AdaLN
        # zero weights) so the test is not trivially at identity
        with torch.no_grad():
            for _, p in tnet.named_parameters():
                if p.requires_grad:
                    p.add_(torch.randn_like(p) * 0.05)
        cfg = ModelConfig(architecture="convnext", dim_in=8, dim=16,
                          convnext_layers=3)
        net = VectorFieldNet(cfg)
        params = map_model_state_dict(tnet.state_dict(), cfg)
        x = rng.standard_normal((2, 11, 8)).astype(np.float32)
        cond = rng.standard_normal((2, 11, 8)).astype(np.float32)
        times = np.array([0.3, 0.8], dtype=np.float32)
        with torch.no_grad():
            ref = tnet.flowhigh(torch.from_numpy(x), torch.from_numpy(times),
                                torch.from_numpy(cond)).numpy()
        got = np.asarray(net.apply(params, jnp.asarray(x),
                                   times=jnp.asarray(times),
                                   cond=jnp.asarray(cond)))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


    def test_export_roundtrip_and_param_order(self):
        """params_to_torch_state previously SKIPPED the convnext backbone
        (silent incomplete export) and reference_param_order had no
        convnext branch (wrong Adam state indices). Pin both against the
        torch replica: strict load_state_dict round-trip + registration
        order (gamma is the block's direct Parameter, yielded before its
        submodules)."""
        from flowhigh_tpu.compat import params_to_torch_state
        from flowhigh_tpu.compat.torch_ckpt import reference_param_order

        torch.manual_seed(0)
        tnet = torch_ref.TorchCFMWrapper(
            dim_in=8, dim=16, architecture="convnext",
            convnext_layers=2).eval()
        with torch.no_grad():
            for _, p in tnet.named_parameters():
                if p.requires_grad:
                    p.add_(torch.randn_like(p) * 0.05)
        cfg = ModelConfig(architecture="convnext", dim_in=8, dim=16,
                          convnext_layers=2)
        params = map_model_state_dict(tnet.state_dict(), cfg)
        sd = {k: torch.from_numpy(np.array(v))
              for k, v in params_to_torch_state(params, cfg).items()}
        missing, unexpected = tnet.load_state_dict(sd, strict=False)
        assert not missing and not unexpected
        orig = tnet.state_dict()
        for k in orig:
            np.testing.assert_allclose(sd[k].numpy(), orig[k].numpy(),
                                       atol=1e-6)
        assert ([n for n, _ in tnet.flowhigh.named_parameters()]
                == reference_param_order(cfg))


class TestBigVGANParity:
    def test_generator_matches_torch(self, rng):
        torch.manual_seed(1)
        tnet = torch_ref.TorchBigVGAN(SMALL_VOC).eval()
        # randomize snake params so the test is not trivially at init
        with torch.no_grad():
            for n, p in tnet.named_parameters():
                if "alpha" in n or "beta" in n:
                    p.copy_(torch.randn_like(p) * 0.3)
        sd = torch_ref.torch_state_dict_weight_normed(tnet)
        params = map_vocoder_state_dict(sd, SMALL_VOC)

        mel = rng.standard_normal((2, 20, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tnet(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0, :]
        jnet = BigVGAN(SMALL_VOC)
        got = np.asarray(jnet.apply(params, jnp.asarray(mel)))
        assert got.shape == ref.shape  # [B, T*8]
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_output_length(self, rng):
        jnet = BigVGAN(SMALL_VOC)
        mel = jnp.zeros((1, 10, 8))
        params = jnet.init(jax.random.PRNGKey(0), mel)
        out = jnet.apply(params, mel)
        assert out.shape == (1, 10 * SMALL_VOC.total_upsample)
