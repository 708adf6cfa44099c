"""CFM math: probability-path closed forms, solver semantics, cutoff search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flowhigh_tpu.cfm import (
    CFM_METHODS, cfm_loss, crop_segments, cutoff_bins_from_energy,
    mel_cutoff_bins, mel_replace, odeint_fixed, sample_path, sample_prior,
)


def _reference_find_cutoff(csum, percentile):
    """Direct transcription of the reference loop
    (cfm_superresolution.py:135-140) for cross-checking the vectorized op."""
    thr = csum[-1] * percentile
    for i in range(1, csum.shape[0]):
        if csum[-i] < thr:
            return csum.shape[0] - i
    return 0


class TestCutoff:
    def test_matches_reference_loop(self, rng):
        for _ in range(20):
            e = rng.random(64).astype(np.float32)
            # make energy concentrated in a random prefix, like band-limited audio
            cut = rng.integers(1, 64)
            e[cut:] *= 1e-6
            csum = np.cumsum(e)
            ref = _reference_find_cutoff(csum, 0.9995)
            got = int(cutoff_bins_from_energy(jnp.asarray(e)[None], 0.9995)[0])
            assert got == ref

    def test_mel_cutoff_shape(self, rng):
        mel = jnp.asarray(rng.standard_normal((3, 50, 256)).astype(np.float32))
        bins = mel_cutoff_bins(mel)
        assert bins.shape == (3,)

    def test_band_limited_detection(self):
        # synthetic log-mel with energy only below bin 100
        mel = np.full((1, 40, 256), np.log(1e-5), np.float32)
        mel[:, :, :100] = 1.0
        cut = int(mel_cutoff_bins(jnp.asarray(mel))[0])
        assert 95 <= cut <= 100

    def test_mel_replace(self, rng):
        hi = jnp.ones((2, 4, 8))
        lo = jnp.zeros((2, 4, 8))
        out = mel_replace(hi, lo, jnp.array([3, 6]))
        out = np.asarray(out)
        assert (out[0, :, :3] == 0).all() and (out[0, :, 3:] == 1).all()
        assert (out[1, :, :6] == 0).all() and (out[1, :, 6:] == 1).all()


class TestPaths:
    """Closed forms at t=0 / t=1 (cfm_superresolution.py:334-461)."""

    @pytest.fixture
    def data(self, rng):
        x1 = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
        cond = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
        return x1, cond

    @pytest.mark.parametrize("method", CFM_METHODS)
    def test_shapes(self, data, method):
        x1, cond = data
        ps = sample_path(jax.random.PRNGKey(0), method, x1, cond,
                         jnp.array([0.3, 0.7]), 1e-4)
        assert ps.x_t.shape == x1.shape and ps.u_t.shape == x1.shape

    def test_basic_cfm_endpoints(self, data):
        x1, cond = data
        s = 1e-4
        t1 = jnp.ones((2,))
        ps = sample_path(jax.random.PRNGKey(1), "basic_cfm", x1, cond, t1, s)
        # at t=1: x_t = s*x0 + x1; u_t = x1 - (1-s)x0 -> x_t ≈ x1 for small s
        x0 = (ps.x_t - t1[:, None, None] * x1) / s
        np.testing.assert_allclose(
            np.asarray(ps.u_t), np.asarray(x1 - (1 - s) * x0), atol=2e-2)

    def test_independent_adaptive_t0(self, data):
        x1, cond = data
        s = 1e-4
        t0 = jnp.zeros((2,))
        ps = sample_path(jax.random.PRNGKey(2), "independent_cfm_adaptive",
                         x1, cond, t0, s)
        # at t=0: x_t = x0 + eps = cond + eps; u_t = (x1-x0) - (1-s) eps
        eps = ps.x_t - cond
        np.testing.assert_allclose(
            np.asarray(ps.u_t), np.asarray((x1 - cond) - (1 - s) * eps), atol=1e-5)

    def test_independent_constant_field(self, data):
        x1, cond = data
        ps = sample_path(jax.random.PRNGKey(3), "independent_cfm_constant",
                         x1, cond, jnp.array([0.4, 0.9]), 1e-4)
        np.testing.assert_allclose(np.asarray(ps.u_t), np.asarray(x1 - cond), atol=1e-6)

    def test_mix_band_split(self, rng):
        # cond band-limited below bin 4 -> low band follows constant path field
        x1 = jnp.asarray(rng.standard_normal((1, 10, 8)).astype(np.float32))
        cond_np = np.full((1, 10, 8), np.log(1e-5), np.float32)
        cond_np[:, :, :4] = 1.0
        cond = jnp.asarray(cond_np)
        ps = sample_path(jax.random.PRNGKey(4), "independent_cfm_mix",
                         x1, cond, jnp.array([0.5]), 1e-4)
        cut = int(ps.cutoff[0])
        assert 1 <= cut <= 4
        np.testing.assert_allclose(
            np.asarray(ps.u_t[..., :cut]), np.asarray((x1 - cond)[..., :cut]), atol=1e-6)

    @pytest.mark.parametrize("method", CFM_METHODS)
    def test_priors(self, data, method):
        x1, cond = data
        cutoff = mel_cutoff_bins(cond) if method == "independent_cfm_mix" else None
        y0 = sample_prior(jax.random.PRNGKey(5), method, cond, 1.0, 0.1, cutoff)
        assert y0.shape == cond.shape
        if method in ("independent_cfm_adaptive", "independent_cfm_constant"):
            # y0 = cond + 0.1 eps -> correlated with cond
            err = float(jnp.mean(jnp.abs(y0 - cond)))
            assert err < 0.2


class TestSolver:
    def test_euler_linear_ode(self):
        # y' = -y, y0 = 1 -> explicit euler product formula
        f = lambda t, y: -y
        y0 = jnp.ones((1,))
        n = 50
        got = float(odeint_fixed(f, y0, n, "euler")[0])
        expected = (1 - 1 / n) ** n
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_midpoint_accuracy(self):
        # midpoint is 2nd order: much closer to e^-1 than euler at same steps
        f = lambda t, y: -y
        y0 = jnp.ones((1,))
        mid = float(odeint_fixed(f, y0, 20, "midpoint")[0])
        eul = float(odeint_fixed(f, y0, 20, "euler")[0])
        exact = np.exp(-1)
        assert abs(mid - exact) < abs(eul - exact) / 10

    def test_time_dependent(self):
        # y' = t, y0=0 -> midpoint integrates quadratics exactly: y(1)=0.5
        f = lambda t, y: jnp.full_like(y, t)
        got = float(odeint_fixed(f, jnp.zeros((1,)), 4, "midpoint")[0])
        np.testing.assert_allclose(got, 0.5, atol=1e-6)

    def test_single_step_euler(self):
        # timestep=1 (the paper setting): y1 = y0 + f(0, y0)
        f = lambda t, y: 2 * y
        got = float(odeint_fixed(f, jnp.ones((1,)), 1, "euler")[0])
        np.testing.assert_allclose(got, 3.0, atol=1e-6)


class TestLoss:
    def test_plain_mse(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
        t = jnp.zeros_like(p)
        np.testing.assert_allclose(
            float(cfm_loss(p, t)), float(jnp.mean(p ** 2)), rtol=1e-6)

    def test_masked_mse(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
        t = jnp.zeros_like(p)
        mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
        got = float(cfm_loss(p, t, mask=mask))
        per = np.mean(np.asarray(p) ** 2, axis=-1)
        ref = np.mean([per[0, :3].sum() / 3, per[1].sum() / 6])
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_weighted(self, rng):
        p = jnp.ones((1, 2, 8))
        t = jnp.zeros_like(p)
        got = float(cfm_loss(p, t, weighted=True, cutoff=jnp.array([4]),
                             low_weight=1.0, high_weight=2.0))
        np.testing.assert_allclose(got, 1.5, rtol=1e-6)


class TestCrop:
    def test_crop_shapes_and_mask(self, rng):
        b, t, m, out = 3, 50, 8, 20
        a = jnp.asarray(rng.standard_normal((b, t, m)).astype(np.float32))
        lengths = jnp.array([50, 10, 30])
        (ca,), mask = crop_segments(jax.random.PRNGKey(0), (a,), lengths, out)
        assert ca.shape == (b, out, m)
        assert mask.shape == (b, out)
        # short sample: only 10 valid frames, rest zero
        assert int(mask[1].sum()) == 10
        assert np.allclose(np.asarray(ca[1, 10:]), 0)
        # full sample: everything valid
        assert int(mask[0].sum()) == out

    def test_crop_content_is_contiguous(self, rng):
        a_np = np.arange(40, dtype=np.float32)[None, :, None].repeat(1, axis=0)
        a = jnp.asarray(a_np)
        (ca,), mask = crop_segments(jax.random.PRNGKey(3), (a,), jnp.array([40]), 8)
        vals = np.asarray(ca[0, :, 0])
        assert (np.diff(vals) == 1).all()  # contiguous window


class TestFreqMask:
    def test_band_is_masked(self, rng):
        from flowhigh_tpu.cfm import freq_mask_cond
        cond = jnp.asarray(rng.standard_normal((3, 20, 256)).astype(np.float32))
        out = freq_mask_cond(jax.random.PRNGKey(0), cond)
        fill = float(jnp.min(cond)) + 1e-3
        for i in range(3):
            masked_bins = np.where(np.all(np.isclose(np.asarray(out[i]), fill), axis=0))[0]
            assert 10 <= len(masked_bins) <= 20
            assert masked_bins.min() >= 20
            # contiguous band
            assert (np.diff(masked_bins) == 1).all()
        # unmasked bins untouched
        keep = np.ones(256, bool)
        i = 0
        masked_bins = np.where(np.all(np.isclose(np.asarray(out[0]), fill), axis=0))[0]
        keep[masked_bins] = False
        np.testing.assert_array_equal(np.asarray(out[0])[:, keep],
                                      np.asarray(cond[0])[:, keep])

    def test_training_loss_with_masking(self, rng):
        from flowhigh_tpu.cfm import cfm_training_loss
        from flowhigh_tpu.config import ModelConfig
        from flowhigh_tpu.models import VectorFieldNet
        cfg = ModelConfig(dim_in=256, dim=32, depth=2, heads=2, dim_head=8)
        net = VectorFieldNet(cfg)
        x = jnp.asarray(rng.standard_normal((2, 30, 256)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x, times=jnp.zeros(()), cond=x)
        loss = cfm_training_loss(
            net.apply, params, jax.random.PRNGKey(1), x, x,
            jnp.array([30, 20]), method="independent_cfm_adaptive", sigma=1e-4,
            out_size=16, cond_freq_masking=True)
        assert np.isfinite(float(loss))


class TestAdaptiveSolver:
    def test_matches_scipy_solve_ivp(self):
        from flowhigh_tpu.cfm import odeint_adaptive
        import scipy.integrate as si
        # stiff-ish nonlinear scalar ODE: y' = -2y + sin(10t)
        f = lambda t, y: -2 * y + jnp.sin(10 * t)
        got = float(odeint_adaptive(f, jnp.ones((1,)), 1e-7, 1e-7)[0])
        ref = si.solve_ivp(lambda t, y: -2 * y + np.sin(10 * t), (0, 1), [1.0],
                           rtol=1e-9, atol=1e-9).y[0, -1]
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_matches_fixed_grid_on_linear_field(self, rng):
        from flowhigh_tpu.cfm import odeint_adaptive
        # CFM-like linear field: adaptive and dense fixed grid should agree
        a = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32) * 0.5)
        f = lambda t, y: a - y * 0.3
        y0 = jnp.zeros((4, 8))
        fixed = odeint_fixed(f, y0, 200, "midpoint")
        adap = odeint_adaptive(f, y0, 1e-6, 1e-6)
        np.testing.assert_allclose(np.asarray(adap), np.asarray(fixed), atol=1e-4)

    def test_per_sample_step_control(self):
        """torchode semantics (reference: cfm_superresolution.py:259-276):
        each batch item is solved independently — one stiff + one easy item
        in the same batch get independent accepted-step counts."""
        from flowhigh_tpu.cfm import odeint_adaptive
        stiff = 60.0

        def f(t, y):
            # item 0: y' = -y (easy); item 1: y' = -stiff*(y - cos(t)) (stiff)
            tb = t[:, None]
            easy = -y
            hard = -stiff * (y - jnp.cos(tb))
            sel = jnp.arange(y.shape[0])[:, None] == 1
            return jnp.where(sel, hard, easy)

        y0 = jnp.ones((2, 4))
        y, stats = odeint_adaptive(f, y0, 1e-6, 1e-6, return_stats=True)
        assert bool(stats.converged.all())
        n_easy, n_hard = int(stats.n_accepted[0]), int(stats.n_accepted[1])
        assert n_hard > 2 * n_easy, (n_easy, n_hard)
        # both solutions correct
        import scipy.integrate as si
        ref_easy = float(np.exp(-1.0))
        ref_hard = si.solve_ivp(
            lambda t, y: -stiff * (y - np.cos(t)), (0, 1), [1.0],
            rtol=1e-9, atol=1e-9).y[0, -1]
        np.testing.assert_allclose(float(y[0, 0]), ref_easy, atol=1e-5)
        np.testing.assert_allclose(float(y[1, 0]), ref_hard, atol=1e-4)

    def test_nonconvergence_is_reported(self):
        from flowhigh_tpu.cfm import odeint_adaptive

        def f(t, y):
            return -1000.0 * y  # very stiff, tiny step budget below

        y, stats = odeint_adaptive(f, jnp.ones((1, 2)), 1e-9, 1e-9,
                                   max_steps=3, return_stats=True)
        assert not bool(stats.converged.all())
        assert int(stats.n_loops) == 3

    def test_sample_warns_on_unconverged(self, rng):
        import warnings as w
        from flowhigh_tpu import ConditionalFlowMatcherWrapper, FLowHigh
        from flowhigh_tpu import cfm as cfm_mod
        fh = FLowHigh(dim_in=8, dim=16, depth=2, dim_head=4, heads=2)
        fh.init_params(jax.random.PRNGKey(0))
        wrp = ConditionalFlowMatcherWrapper(
            fh, use_torchode=True, cfm_method="basic_cfm",
            ode_atol=1e-12, ode_rtol=1e-12)
        cond = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
        orig = cfm_mod.odeint_adaptive
        import functools
        cfm_mod.odeint_adaptive = functools.partial(orig, max_steps=2)
        try:
            with w.catch_warnings(record=True) as caught:
                w.simplefilter("always")
                wrp.sample(cond=cond, decode_to_audio=False)
            assert any("max_steps" in str(c.message) for c in caught)
        finally:
            cfm_mod.odeint_adaptive = orig

    def test_wrapper_use_torchode_flag(self, rng):
        from flowhigh_tpu import ConditionalFlowMatcherWrapper, FLowHigh
        fh = FLowHigh(dim_in=8, dim=16, depth=2, dim_head=4, heads=2)
        fh.init_params(jax.random.PRNGKey(0))
        w = ConditionalFlowMatcherWrapper(fh, use_torchode=True,
                                          cfm_method="basic_cfm")
        # torchode in the reference is Tsit5 — the flag selects that tableau
        assert w.ode_tableau == "tsit5"
        cond = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
        mel = w.sample(cond=cond, decode_to_audio=False)
        assert mel.shape == (1, 12, 8)
        assert np.isfinite(np.asarray(mel)).all()

    def test_tsit5_matches_scipy_solve_ivp(self):
        """Tsit5 tableau (the reference torchode solver's pair,
        cfm_superresolution.py:259-276): same consistency bar as dopri5."""
        from flowhigh_tpu.cfm import odeint_adaptive
        import scipy.integrate as si
        f = lambda t, y: -2 * y + jnp.sin(10 * t)
        got = float(odeint_adaptive(f, jnp.ones((1,)), 1e-7, 1e-7,
                                    tableau="tsit5")[0])
        ref = si.solve_ivp(lambda t, y: -2 * y + np.sin(10 * t), (0, 1), [1.0],
                           rtol=1e-9, atol=1e-9).y[0, -1]
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_tsit5_matches_dopri5(self, rng):
        from flowhigh_tpu.cfm import odeint_adaptive
        a = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32) * 0.5)
        f = lambda t, y: a - y * 0.3
        y0 = jnp.zeros((4, 8))
        dopri = odeint_adaptive(f, y0, 1e-6, 1e-6, tableau="dopri5")
        tsit = odeint_adaptive(f, y0, 1e-6, 1e-6, tableau="tsit5")
        np.testing.assert_allclose(np.asarray(tsit), np.asarray(dopri),
                                   atol=1e-4)

    def test_tsit5_order(self):
        """The embedded pair really is 5(4): halving tolerance must shrink
        the error, and the 5th-order propagation beats a coarse fixed grid."""
        from flowhigh_tpu.cfm import odeint_adaptive
        import scipy.integrate as si
        f = lambda t, y: jnp.cos(8 * t) * y
        ref = si.solve_ivp(lambda t, y: np.cos(8 * t) * y, (0, 1), [1.0],
                           rtol=1e-12, atol=1e-12).y[0, -1]
        coarse = abs(float(odeint_adaptive(
            f, jnp.ones((1,)), 1e-4, 1e-4, tableau="tsit5")[0]) - ref)
        # (tighter than 1e-6 hits the f32 accumulation floor ~1e-6)
        fine = abs(float(odeint_adaptive(
            f, jnp.ones((1,)), 1e-6, 1e-6, tableau="tsit5")[0]) - ref)
        assert fine < coarse
        assert fine < 2e-6

    def test_unknown_tableau_rejected(self):
        from flowhigh_tpu.cfm import odeint_adaptive
        with pytest.raises(ValueError, match="tableau"):
            odeint_adaptive(lambda t, y: -y, jnp.ones((1,)), tableau="rk4")
