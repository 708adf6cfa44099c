"""ServingPipeline: concurrent-clip serving with futures.

Pins the product API around the measured-optimal serving structure
(PERF.md round-4 sustained pipelined serving): feeder thread owns
uploads + async dispatch, fetch thread owns downloads; results must be
bit-identical to the blocking ``FlowHighSR.generate`` path when the
seed is pinned (same padded program, same key).
"""

import numpy as np
import pytest

import jax

from flowhigh_tpu import ServingPipeline


@pytest.fixture(scope="module")
def tiny_model():
    from test_sr import TINY

    from flowhigh_tpu import FlowHighSR
    m = FlowHighSR(TINY, cfm_method="independent_cfm_adaptive",
                   ode_method="euler")
    m.init_params(jax.random.PRNGKey(0))
    return m


class TestServingPipeline:
    def test_matches_generate_with_pinned_seed(self, tiny_model, rng):
        audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
        direct = tiny_model.generate(audio, 16000, seed=7)
        with ServingPipeline(tiny_model) as srv:
            served = srv.submit(audio, 16000, seed=7).result(timeout=120)
        np.testing.assert_array_equal(served, direct)

    def test_many_in_flight_orders_and_shapes(self, tiny_model, rng):
        # distinct lengths AND rates: several compiled programs in one run
        clips = [(rng.standard_normal(n) * 0.3).astype(np.float32)
                 for n in (8000, 16000, 12000, 24000, 4000, 16000)]
        srs = [16000, 16000, 24000, 24000, 16000, 16000]
        with ServingPipeline(tiny_model, max_in_flight=3) as srv:
            outs = srv.generate_many(clips, srs, seeds=list(range(6)))
        for a, r, o, s in zip(clips, srs, outs, range(6)):
            assert o.shape[0] == 1 and o.dtype == np.float32
            assert o.shape[1] == len(a) * 48000 // r
            np.testing.assert_array_equal(o, tiny_model.generate(a, r, seed=s))

    def test_default_seeds_differ_per_request(self, tiny_model, rng):
        # needs a stochastic prior: independent_cfm_adaptive under reference
        # prior semantics is deterministic (std_2 overwritten to sigma=0,
        # reference cfm_superresolution.py:178-183), so use basic_cfm
        audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
        tiny_model.set_cfm_method("basic_cfm")
        try:
            with ServingPipeline(tiny_model) as srv:
                a, b = srv.generate_many([audio, audio], 16000)
        finally:
            tiny_model.set_cfm_method("independent_cfm_adaptive")
        assert a.shape == b.shape
        assert not np.array_equal(a, b)  # fold_in(base, req_id) salts keys

    def test_int16_wire_close_to_float(self, tiny_model, rng):
        audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
        with ServingPipeline(tiny_model) as srv_f:
            ref = srv_f.submit(audio, 16000, seed=3).result(timeout=120)
        with ServingPipeline(tiny_model, wire="int16") as srv_i:
            got = srv_i.submit(audio, 16000, seed=3).result(timeout=120)
        assert got.dtype == np.float32
        assert np.abs(got - np.clip(ref, -1, 1)).max() <= (0.5 / 32767) + 1e-7

    def test_int16_scale_input_convention(self, tiny_model, rng):
        # reference flowhighsr.py:59-63: |x|>1 input is int16-scaled
        audio = (rng.standard_normal(16000) * 8000).astype(np.float32)
        with ServingPipeline(tiny_model) as srv:
            served = srv.submit(audio, 16000, seed=1).result(timeout=120)
        np.testing.assert_array_equal(
            served, tiny_model.generate(audio, 16000, seed=1))

    def test_int16_input_wire_bit_matches_float_path(self, tiny_model, rng):
        # int16-dtype input uploads raw samples and casts+scales on device;
        # int16 is exact in float32 and /32768 is a power of two, so the
        # result must be BIT-identical to generate() on the same array
        audio = (rng.standard_normal(16000) * 8000).astype(np.int16)
        with ServingPipeline(tiny_model) as srv:
            srv.warmup(16000, 1.0, dtype=np.int16)
            served = srv.submit(audio, 16000, seed=4).result(timeout=120)
        np.testing.assert_array_equal(
            served, tiny_model.generate(audio, 16000, seed=4))

    def test_request_error_does_not_kill_pipeline(self, tiny_model, rng):
        good = (rng.standard_normal(16000) * 0.3).astype(np.float32)
        with ServingPipeline(tiny_model) as srv:
            bad_fut = srv.submit(good, 0)  # rate too low for the bucket
            good_fut = srv.submit(good, 16000, seed=2)
            with pytest.raises(ValueError, match="too low"):
                bad_fut.result(timeout=120)
            out = good_fut.result(timeout=120)
        np.testing.assert_array_equal(
            out, tiny_model.generate(good, 16000, seed=2))

    def test_submit_validation_is_synchronous(self, tiny_model):
        srv = ServingPipeline(tiny_model)
        try:
            with pytest.raises(ValueError, match=r"\[T\] or \[1, T\]"):
                srv.submit(np.zeros((2, 2, 2), np.float32), 16000)
            with pytest.raises(ValueError, match="empty"):
                srv.submit(np.zeros((0,), np.float32), 16000)
        finally:
            srv.close()

    def test_close_idempotent_and_rejects_new(self, tiny_model, rng):
        audio = (rng.standard_normal(8000) * 0.3).astype(np.float32)
        srv = ServingPipeline(tiny_model)
        fut = srv.submit(audio, 16000, seed=0)
        srv.close()
        assert fut.result(timeout=120).shape[0] == 1  # drained before stop
        srv.close()  # idempotent
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(audio, 16000)

    def test_constructor_validation(self, tiny_model):
        with pytest.raises(ValueError, match="wire"):
            ServingPipeline(tiny_model, wire="f8")
        with pytest.raises(ValueError, match="max_in_flight"):
            ServingPipeline(tiny_model, max_in_flight=0)

    def test_warmup(self, tiny_model):
        with ServingPipeline(tiny_model) as srv:
            srv.warmup(16000, 0.5)  # compiles the (16000, 1-bucket) program

    def test_soak_smoke_no_host_leak(self, tiny_model, rng):
        """Hundreds of clips through one pipeline: all complete, no stage
        errors, and host RSS growth DECAYS phase over phase (allocator/pool
        warm-up plateau, measured 54->21->6->3 MB per 100 clips) rather
        than staying linear — the in-process CPU backend does NOT
        reproduce the linear ~0.8 MB/clip client-layer retention measured
        on the tunneled TPU backend (PERF.md round-5,
        scripts/soak_serving.py --diag + scripts/probe_rss_leak.py)."""
        def rss_mb():
            with open("/proc/self/statm") as f:
                return int(f.read().split()[1]) * 4096 / 1e6

        clip = (rng.standard_normal(8000) * 32000).astype(np.int16)
        per_phase = 100
        growth = []
        with ServingPipeline(tiny_model, max_in_flight=4,
                             wire="int16") as srv:
            srv.submit(clip, 16000).result()  # compile outside the window
            for _phase in range(3):
                r0 = rss_mb()
                futs = [srv.submit(clip, 16000) for _ in range(per_phase)]
                outs = [f.result() for f in futs]
                growth.append(rss_mb() - r0)
                assert len(outs) == per_phase
                assert all(o.dtype == np.float32 and o.size for o in outs)
            assert not srv._pipe.stage_errors
        # a linear per-clip leak would hold the first-phase rate; the
        # warm-up plateau drops well under half of it by phase 3
        assert growth[2] < max(15.0, 0.5 * growth[0]), (
            f"host RSS growth not plateauing: {growth} MB per "
            f"{per_phase}-clip phase")
