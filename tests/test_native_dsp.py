"""Parity tests for the native (C++) host-DSP library.

``flowhigh_tpu.native`` re-implements scipy.signal's ``sosfiltfilt`` and
``resample_poly`` (the degradation-pipeline hot ops, reference:
src/flowhigh/train/data.py:110-123) in C++ with scipy-exact semantics.
These tests pin every primitive and the fused degrade chain against scipy
goldens, plus the auto-fallback contract of ``host_degrade(engine=...)``.
"""

import numpy as np
import pytest
import scipy.signal as sps

from flowhigh_tpu import native
from flowhigh_tpu.dsp.filters import host_degrade

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native DSP library unavailable (no g++?)")

RNG = np.random.default_rng(1234)


class TestSosfiltfilt:
    @pytest.mark.parametrize("order", [1, 2, 3, 5, 8, 11])
    @pytest.mark.parametrize("ripple", [1e-9, 0.05, 5.0])
    def test_matches_scipy(self, order, ripple):
        sos = sps.cheby1(order, ripple, 0.21, btype="lowpass", output="sos")
        x = RNG.standard_normal(4000)
        ours = native.sosfiltfilt(sos, x)
        ref = sps.sosfiltfilt(sos, x)
        np.testing.assert_allclose(ours, ref, rtol=1e-9,
                                   atol=1e-11 * np.abs(ref).max())

    def test_short_input_just_above_padlen(self):
        sos = sps.cheby1(4, 0.1, 0.3, btype="lowpass", output="sos")
        edge = native._filtfilt_edge(np.asarray(sos, np.float64))
        x = RNG.standard_normal(edge + 1)
        np.testing.assert_allclose(native.sosfiltfilt(sos, x),
                                   sps.sosfiltfilt(sos, x),
                                   rtol=1e-9, atol=1e-9)

    def test_padlen_error_matches_scipy_contract(self):
        sos = sps.cheby1(4, 0.1, 0.3, btype="lowpass", output="sos")
        edge = native._filtfilt_edge(np.asarray(sos, np.float64))
        with pytest.raises(ValueError):
            native.sosfiltfilt(sos, RNG.standard_normal(edge))
        with pytest.raises(ValueError):
            sps.sosfiltfilt(sos, RNG.standard_normal(edge))

    def test_sosfilt_zi_matches_scipy(self):
        for order, ripple in [(1, 0.05), (4, 1.0), (11, 1e-6)]:
            sos = np.asarray(
                sps.cheby1(order, ripple, 0.4, btype="lowpass", output="sos"),
                np.float64)
            zi = np.empty((sos.shape[0], 2))
            native._load().fh_sosfilt_zi(
                np.ascontiguousarray(sos), sos.shape[0], zi)
            np.testing.assert_allclose(zi, sps.sosfilt_zi(sos),
                                       rtol=1e-12, atol=1e-14)


class TestResamplePoly:
    @pytest.mark.parametrize("rate", list(range(4000, 33000, 1000)))
    def test_training_rate_set_roundtrip(self, rate):
        """Both degrade directions for every reference target rate
        (reference: data.py:97-101 — rates 4k..32k step 1k vs sr 48k)."""
        sr = 48000
        x = RNG.standard_normal(9601)
        dn_ref = sps.resample_poly(x, rate, sr)
        dn = native.resample_poly(x, rate, sr)
        assert dn.shape == dn_ref.shape
        np.testing.assert_allclose(dn, dn_ref, rtol=1e-9, atol=1e-11)
        up_ref = sps.resample_poly(dn_ref, sr, rate)
        up = native.resample_poly(dn, sr, rate)
        assert up.shape == up_ref.shape
        np.testing.assert_allclose(up, up_ref, rtol=1e-9, atol=1e-11)

    @pytest.mark.parametrize("n", [37, 100, 481, 4801])
    def test_awkward_lengths(self, n):
        x = RNG.standard_normal(n)
        for up, down in [(3, 16), (16, 3), (1, 12), (12, 1), (31, 48)]:
            ref = sps.resample_poly(x, up, down)
            ours = native.resample_poly(x, up, down)
            assert ours.shape == ref.shape, (n, up, down)
            np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-11)

    def test_identity_ratio_copies(self):
        x = RNG.standard_normal(100)
        y = native.resample_poly(x, 7, 7)
        np.testing.assert_array_equal(x, y)
        assert y is not x


class TestHostDegrade:
    CASES = [(4000, 1, 1e-9), (8000, 8, 0.05), (9000, 11, 5.0),
             (17000, 4, 1e-3), (31000, 5, 1.0), (32000, 3, 1e-6)]

    @pytest.mark.parametrize("rate,order,ripple", CASES)
    def test_native_matches_scipy_chain(self, rate, order, ripple):
        sr = 48000
        wave = RNG.standard_normal(sr)  # 1 s
        ref = host_degrade(wave, sr, rate, order, ripple, engine="scipy")
        ours = native.host_degrade(wave, sr, rate, order, ripple)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)

    def test_auto_engine_prefers_native(self):
        sr = 48000
        wave = RNG.standard_normal(sr // 2)
        auto = host_degrade(wave, sr, 8000, 8, 0.05, engine="auto")
        nat = native.host_degrade(wave, sr, 8000, 8, 0.05)
        np.testing.assert_array_equal(auto, nat)

    def test_auto_falls_back_when_native_unavailable(self, monkeypatch):
        sr = 48000
        wave = RNG.standard_normal(sr // 2)
        want = host_degrade(wave, sr, 8000, 8, 0.05, engine="scipy")
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_lib_error", RuntimeError("simulated"))
        got = host_degrade(wave, sr, 8000, 8, 0.05, engine="auto")
        np.testing.assert_array_equal(got, want)
        with pytest.raises(native.NativeUnavailable):
            host_degrade(wave, sr, 8000, 8, 0.05, engine="native")

    def test_degrade_item_schema_unchanged(self):
        """Integration: the dataset item contract survives the engine swap."""
        from flowhigh_tpu.config import DataConfig
        from flowhigh_tpu.train.data import degrade_item
        item = degrade_item(RNG.standard_normal(24000).astype(np.float32),
                            48000, DataConfig(), None,
                            np.random.default_rng(0))
        assert item["cond"].dtype == np.float32
        assert item["cond"].shape == item["wave"].shape
        assert np.isfinite(item["cond"]).all()
