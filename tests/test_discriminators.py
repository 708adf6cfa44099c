"""MPD/MRD discriminators + GAN losses (vocoder training side)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flowhigh_tpu.models.discriminators import (
    DiscriminatorP, DiscriminatorR, MultiPeriodDiscriminator,
    MultiResolutionDiscriminator, discriminator_loss, feature_loss,
    generator_loss)


@pytest.fixture
def wavs(rng):
    y = jnp.asarray(rng.standard_normal((2, 9600)).astype(np.float32) * 0.3)
    yh = jnp.asarray(rng.standard_normal((2, 9600)).astype(np.float32) * 0.3)
    return y, yh


class TestDiscriminators:
    def test_period_disc_pads_and_scores(self, wavs):
        y, _ = wavs
        d = DiscriminatorP(period=7)  # 9600 % 7 != 0 -> reflect pad path
        params = d.init(jax.random.PRNGKey(0), y)
        out, fmap = d.apply(params, y)
        assert out.shape[0] == 2 and len(fmap) == 6
        assert np.isfinite(np.asarray(out)).all()

    def test_resolution_disc(self, wavs):
        y, _ = wavs
        d = DiscriminatorR(resolution=(1024, 120, 600))
        params = d.init(jax.random.PRNGKey(0), y)
        out, fmap = d.apply(params, y)
        assert out.shape[0] == 2 and len(fmap) == 6

    def test_mpd_mrd_ensembles(self, wavs):
        y, yh = wavs
        for D in (MultiPeriodDiscriminator(), MultiResolutionDiscriminator()):
            params = D.init(jax.random.PRNGKey(0), y, yh)
            o_r, o_g, f_r, f_g = D.apply(params, y, yh)
            n = len(o_r)
            assert n in (3, 5) and len(f_r) == n

    def test_losses(self, wavs):
        y, yh = wavs
        D = MultiPeriodDiscriminator(periods=(2, 3))
        params = D.init(jax.random.PRNGKey(0), y, yh)
        o_r, o_g, f_r, f_g = D.apply(params, y, yh)
        d_loss, r_l, g_l = discriminator_loss(o_r, o_g)
        g_loss, gl = generator_loss(o_g)
        fm = feature_loss(f_r, f_g)
        assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
        assert float(fm) >= 0
        assert len(r_l) == len(g_l) == 2

    def test_perfect_disc_zero_gen_reward(self):
        # generator loss is 0 when discriminator outputs exactly 1
        g_loss, _ = generator_loss([jnp.ones((2, 10))])
        assert float(g_loss) == 0.0
        d_loss, _, _ = discriminator_loss([jnp.ones((2, 10))], [jnp.zeros((2, 10))])
        assert float(d_loss) == 0.0
