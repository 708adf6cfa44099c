"""Metrics, long-form streaming, and CLI smoke tests."""

import numpy as np
import pytest
import scipy.io.wavfile as wavfile

import jax
import jax.numpy as jnp

from flowhigh_tpu.metrics import (RTFTimer, high_band_lsd,
                                  log_spectral_distance, snr_db)


class TestMetrics:
    def test_lsd_zero_for_identical(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 24000)).astype(np.float32))
        assert float(log_spectral_distance(x, x)[0]) < 1e-5

    def test_lsd_detects_band_limitation(self, rng):
        n = np.arange(48000) / 48000
        full = (np.sin(2 * np.pi * 440 * n)
                + 0.3 * np.sin(2 * np.pi * 15000 * n)).astype(np.float32)
        lowpassed = np.sin(2 * np.pi * 440 * n).astype(np.float32)
        lsd = float(log_spectral_distance(jnp.asarray(full)[None],
                                          jnp.asarray(lowpassed)[None])[0])
        assert lsd > 0.5
        hb = float(high_band_lsd(jnp.asarray(full)[None],
                                 jnp.asarray(lowpassed)[None])[0])
        assert hb > lsd  # damage concentrated in the high band

    def test_snr(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
        assert float(snr_db(x, x)[0]) > 100
        noisy = x + 0.1 * jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
        s = snr_db(x, noisy)
        assert 10 < float(s[0]) < 30

    def test_rtf_timer(self):
        timer = RTFTimer(audio_seconds=1.0)
        f = jax.jit(lambda x: x * 2)
        rtf = timer.measure(f, jnp.ones((1000,)), reps=3)
        assert rtf > 1.0
        assert timer.p50_latency > 0


@pytest.fixture(scope="module")
def tiny_model():
    from test_sr import TINY

    from flowhigh_tpu import FlowHighSR
    m = FlowHighSR(TINY, cfm_method="independent_cfm_adaptive", ode_method="euler")
    m.init_params(jax.random.PRNGKey(0))
    return m


class TestStreaming:
    def test_long_clip_stitches(self, tiny_model, rng):
        from flowhigh_tpu.streaming import StreamingSR
        s = StreamingSR(tiny_model, chunk_seconds=1.0, overlap_seconds=0.25)
        audio = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)  # 3 s
        out = s.generate(audio, 16000)
        assert out.shape == (1, 48000 * 3)
        assert np.isfinite(out).all()
        # energy everywhere (no dead zones at chunk boundaries)
        seg = out[0].reshape(-1, 4800)
        assert (np.abs(seg).max(axis=1) > 1e-4).all()

    def test_short_clip_passthrough(self, tiny_model, rng):
        from flowhigh_tpu.streaming import StreamingSR
        s = StreamingSR(tiny_model, chunk_seconds=2.0, overlap_seconds=0.25)
        audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
        direct = tiny_model.generate(audio, 16000, seed=0)
        chunked = s.generate(audio, 16000, seed=0)
        np.testing.assert_array_equal(direct, chunked)

    def test_int16_wire_matches_float(self, tiny_model, rng):
        """wire='int16' (device-quantized downloads, half the bytes) must
        match the float32 wire to int16 quantization (~3.1e-5 per chunk,
        slightly relaxed for crossfade re-normalization)."""
        from flowhigh_tpu.streaming import StreamingSR
        kw = dict(chunk_seconds=1.0, overlap_seconds=0.25)
        audio = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)
        ref = StreamingSR(tiny_model, **kw).generate(audio, 16000, seed=3)
        got = StreamingSR(tiny_model, wire="int16", **kw).generate(
            audio, 16000, seed=3)
        assert got.shape == ref.shape and got.dtype == np.float32
        np.testing.assert_allclose(got, ref, atol=1e-4)
        with pytest.raises(ValueError):
            StreamingSR(tiny_model, wire="f8")

    def test_int16_wire_hard_clips_overshoot(self):
        """The int16 wire hard-limits raw arrays to [-1, 1]. NOTE this
        clip is VESTIGIAL for every in-tree consumer — the splice ends in
        the reference's 0.99 peak-norm, so wire inputs are always
        <= 0.99 (TestInt16WireHotMaterial pins it); the clip guards only
        out-of-tree arrays fed to _wire_int16 directly."""
        import jax.numpy as jnp

        from flowhigh_tpu.sr import _wire_int16
        x = jnp.asarray([[0.5, -1.03, 1.03, 0.999]], jnp.float32)
        w = np.asarray(_wire_int16(x))
        assert w.dtype == np.int16
        rt = w.astype(np.float32) / 32767.0
        np.testing.assert_allclose(rt[0, 0], 0.5, atol=3.1e-5)
        np.testing.assert_allclose(rt[0, 3], 0.999, atol=3.1e-5)
        assert rt[0, 2] <= 1.0 and rt[0, 1] >= -32768.0 / 32767.0  # clipped

    def test_int16_input_wire_bit_matches_float(self, tiny_model, rng):
        """int16-dtype long-form input rides the int16 INPUT wire chunk by
        chunk (raw int16 uploads, cast+scaled on device) — bit-identical
        to the host-scaled float path, like generate()/ServingPipeline."""
        from flowhigh_tpu.streaming import StreamingSR
        s = StreamingSR(tiny_model, chunk_seconds=1.0, overlap_seconds=0.25)
        pcm = (rng.standard_normal(16000 * 3) * 8000).astype(np.int16)
        ref = s.generate(pcm.astype(np.float32) / 32768.0, 16000, seed=4)
        got = s.generate(pcm, 16000, seed=4)
        np.testing.assert_array_equal(got, ref)
        # full-duplex: int16 in AND out still within pure quantization
        got_dx = StreamingSR(tiny_model, wire="int16",
                             chunk_seconds=1.0,
                             overlap_seconds=0.25).generate(pcm, 16000, seed=4)
        assert np.abs(got_dx - ref).max() <= 0.51 / 32767.0

    def test_pipeline_depth_validated(self, tiny_model):
        """pipeline_depth<1 must fail loudly: Queue(maxsize=0) is unbounded,
        silently inverting the HBM-backpressure meaning of 'depth 0'."""
        from flowhigh_tpu.streaming import StreamingSR
        with pytest.raises(ValueError, match="pipeline_depth"):
            StreamingSR(tiny_model, pipeline_depth=0)


class TestInt16WireHotMaterial:
    """Quantified int16-wire error on hot material (VERDICT r4 weak #6).

    Empirical finding (round 5): the wire can NEVER clip in-tree. Every
    wire consumer (dispatch_generate, ServingPipeline, StreamingSR)
    quantizes the post-splice output, and the splice ends in the
    reference's x0.99 peak-norm (reference postprocessing.py:39-41; ours
    postprocessing.py:51-52) — so wire inputs are bounded to exactly 0.99
    regardless of how hot the input is, and the wire error is PURE
    -96 dBFS quantization (<= 0.5/32767 per sample). The crossfade
    stitcher is a convex combination of per-chunk quantized samples, so
    the stitched error obeys the same bound. Numbers recorded in
    BASELINE.md round-5."""

    def _hot(self, n=32000, sr=16000):
        # hard-clipped dense-harmonic near-full-scale material
        t = np.arange(n) / sr
        return (np.clip(3.0 * (np.sin(2 * np.pi * 220 * t)
                               + 0.7 * np.sin(2 * np.pi * 913 * t)),
                        -1, 1) * 0.999).astype(np.float32)

    def test_splice_peak_norm_bounds_output(self, tiny_model):
        out = tiny_model.generate(self._hot(), 16000, seed=0)
        np.testing.assert_allclose(np.abs(out).max(), 0.99, rtol=1e-6)

    def test_serving_wire_error_is_pure_quantization(self, tiny_model):
        from flowhigh_tpu.serving import ServingPipeline
        hot = self._hot()
        with ServingPipeline(tiny_model) as srv:
            ref = srv.submit(hot, 16000, seed=3).result()
        with ServingPipeline(tiny_model, wire="int16") as srv:
            got = srv.submit(hot, 16000, seed=3).result()
        err = np.abs(got - ref).max()
        assert err <= 0.51 / 32767.0, err  # no clipping term, ever

    def test_streaming_wire_error_bound_on_hot_clip(self, tiny_model):
        from flowhigh_tpu.metrics import log_spectral_distance
        from flowhigh_tpu.streaming import StreamingSR
        import jax.numpy as jnp
        hot = self._hot(n=16000 * 4)
        kw = dict(chunk_seconds=1.0, overlap_seconds=0.25)
        ref = StreamingSR(tiny_model, **kw).generate(hot, 16000, seed=5)
        got = StreamingSR(tiny_model, wire="int16", **kw).generate(
            hot, 16000, seed=5)
        err = np.abs(got - ref).max()
        # convex crossfade of per-chunk quantized samples: same bound
        assert err <= 0.51 / 32767.0, err
        lsd = float(10.0 * np.asarray(log_spectral_distance(
            jnp.asarray(ref), jnp.asarray(got),
            n_fft=512, hop_length=128)).mean())
        print(f"\n[int16-wire] hot-clip stitched wire LSD {lsd:.2e} dB, "
              f"max err {err * 32767.0:.3f} LSB")
        assert lsd <= 5e-3, lsd


class TestShardedLongform:
    """Chunk-parallel long-form over the CPU mesh (VERDICT r4 next #5 —
    the SP/CP analog of SURVEY §2.4): ONE clip's chunks sharded over the
    data axis via make_sharded_generate, stitched on host. The sharded-vs-
    single-chip row equality at flagship dims lives in
    tests/test_distributed.py::TestFlagshipShardedGenerate."""

    def test_sharded_longform_stitches(self, tiny_model, rng):
        from flowhigh_tpu.parallel import make_mesh
        from flowhigh_tpu.streaming import StreamingSR

        mesh = make_mesh(n_data=4, n_model=1)
        s = StreamingSR(tiny_model, chunk_seconds=1.0, overlap_seconds=0.25)
        audio = (rng.standard_normal(16000 * 4) * 0.3).astype(np.float32)
        out = s.generate_sharded(audio, 16000, mesh, seed=2)
        assert out.shape == (1, 48000 * 4)
        assert np.isfinite(out).all()
        # energy everywhere (no dead zones at chunk boundaries or in
        # regions that rode the zero-padded rows)
        seg = out[0].reshape(-1, 4800)
        assert (np.abs(seg).max(axis=1) > 1e-4).all()
        # deterministic: the compiled program is cached and keyed rng
        out2 = s.generate_sharded(audio, 16000, mesh, seed=2)
        np.testing.assert_array_equal(out, out2)
        assert len(s._sharded_fns) == 1  # one compile for both calls

    def test_sharded_longform_interior_passthrough(self, tiny_model, rng):
        """Interior samples (weight 1, single contributing chunk) must
        pass the per-chunk sharded outputs through bit-exactly — pins the
        chunk geometry + stitch math over the mesh path."""
        from flowhigh_tpu.parallel import make_mesh
        from flowhigh_tpu.streaming import StreamingSR

        mesh = make_mesh(n_data=4, n_model=1)
        s = StreamingSR(tiny_model, chunk_seconds=1.0, overlap_seconds=0.25)
        sr_in, n = 16000, 16000 * 4
        audio = (rng.standard_normal(n) * 0.3).astype(np.float32)
        out = s.generate_sharded(audio, sr_in, mesh, seed=7)

        chunk_in, overlap_in = 16000, 4000
        hop_in = chunk_in - overlap_in
        n_chunks = 5  # 1 + ceil((64000-16000)/12000)
        segs = [np.pad(audio[c * hop_in : c * hop_in + chunk_in],
                       (0, max(0, chunk_in - len(audio[c * hop_in:])))
                       )[:chunk_in].astype(np.float32)
                for c in range(n_chunks)]
        segs += [np.zeros(chunk_in, np.float32)] * 3  # pad to dp4 multiple
        mesh_key = (tuple(mesh.shape.items()),
                    tuple(d.id for d in mesh.devices.flat))
        fn = s._sharded_fns[(mesh_key, sr_in, 48000, 1)]
        ys = np.asarray(fn(np.stack(segs),
                           np.full(8, chunk_in, np.int32), seed=7)[0])
        to3 = lambda x: 3 * x
        for c in range(n_chunks):
            y = ys[c][: to3(chunk_in)]
            o0 = to3(c * hop_in)
            lo = to3(overlap_in) if c > 0 else 0
            hi = len(y) - (to3(overlap_in) if c < n_chunks - 1 else 0)
            hi = min(hi, out.shape[1] - o0)
            np.testing.assert_array_equal(out[0, o0 + lo : o0 + hi],
                                          y[lo:hi])


class TestLongform:
    """Single-pass long-form mode (VERDICT r2 item 2): full-context CFM in
    one program, bit-exact chunked vocoder, whole-clip splice."""

    def test_chunked_vocode_bit_exact(self, tiny_model, rng):
        mel = jnp.asarray(rng.standard_normal((1, 64, 256)).astype(np.float32))
        full = np.asarray(tiny_model.melvoco.vocoder.apply(
            tiny_model.melvoco.vocoder_params, mel))
        chunked = tiny_model.vocode_chunked(mel, chunk_frames=16,
                                            overlap_frames=8)
        assert chunked.shape == full.shape
        np.testing.assert_allclose(chunked, full, atol=1e-5)

    def test_longform_matches_generate(self, tiny_model, rng):
        """On a clip generate() can run whole, generate_longform must
        reproduce it — the only difference is the (bit-exact) vocoder
        chunking, so any deviation is a seam bug."""
        audio = (rng.standard_normal(16000 * 4) * 0.3).astype(np.float32)
        whole = tiny_model.generate(audio, 16000, timestep=1, seed=5)
        lf = tiny_model.generate_longform(audio, 16000, timestep=1, seed=5,
                                          vocoder_chunk_frames=96,
                                          vocoder_overlap_frames=32)
        assert lf.shape == whole.shape
        np.testing.assert_allclose(lf, whole, atol=2e-4)

    def test_streaming_seam_lsd(self, tiny_model, rng):
        """VERDICT r2 weak #4: measure boundary-window LSD of StreamingSR's
        crossfaded chunks against the single-pass output and pin a bound.
        (Chunks draw independent runs of the pipeline, so seams are where
        streaming can deviate; the single-pass mode has none.)"""
        from flowhigh_tpu.metrics import boundary_lsd, log_spectral_distance
        from flowhigh_tpu.streaming import StreamingSR

        sr_in = 16000
        audio = (rng.standard_normal(sr_in * 5) * 0.3).astype(np.float32)
        single = tiny_model.generate_longform(
            audio, sr_in, timestep=1, seed=0,
            vocoder_chunk_frames=128, vocoder_overlap_frames=32)
        s = StreamingSR(tiny_model, chunk_seconds=2.0, overlap_seconds=0.5)
        streamed = s.generate(audio, sr_in, timestep=1, seed=0)
        assert streamed.shape == single.shape

        hop_in = int(2.0 * sr_in) - int(0.5 * sr_in)
        n_chunks = 1 + int(np.ceil((len(audio) - 2.0 * sr_in) / hop_in))
        boundaries = [c * hop_in * 3 for c in range(1, n_chunks)]
        seam = boundary_lsd(single, streamed, boundaries, window=24000)
        # whole-clip LSD for context: seams should not be categorically
        # worse than the overall chunking difference
        overall = float(log_spectral_distance(
            jnp.asarray(single), jnp.asarray(streamed))[0])
        assert seam < max(2.0, 2.5 * overall), (seam, overall)
        assert np.isfinite(seam) and np.isfinite(overall)


class TestCLI:
    def test_infer_smoke(self, tmp_path, rng):
        # smoke mode (tiny random weights) exercises the whole infer path
        import flowhigh_tpu.cli as cli

        sr_in, n = 16000, 16000
        wav = (rng.standard_normal(n) * 0.2 * 32767).astype(np.int16)
        inp = tmp_path / "in.wav"
        outp = tmp_path / "out.wav"
        wavfile.write(inp, sr_in, wav)
        rc = cli.main(["infer", "--input", str(inp), "--output", str(outp),
                       "--time_step", "1", "--ode_method", "euler",
                       "--cfm_method", "independent_cfm_adaptive", "--tiny"])
        assert rc == 0
        sr_out, data = wavfile.read(outp)
        assert sr_out == 48000
        assert len(data) == n * 3

    def test_infer_longform_single_pass(self, tmp_path, rng):
        import flowhigh_tpu.cli as cli

        sr_in, n = 16000, 16000
        wav = (rng.standard_normal(n) * 0.2 * 32767).astype(np.int16)
        inp = tmp_path / "in.wav"
        outp = tmp_path / "out.wav"
        wavfile.write(inp, sr_in, wav)
        rc = cli.main(["infer", "--input", str(inp), "--output", str(outp),
                       "--time_step", "1", "--ode_method", "euler",
                       "--cfm_method", "independent_cfm_adaptive", "--tiny",
                       "--longform", "single_pass"])
        assert rc == 0
        sr_out, data = wavfile.read(outp)
        assert sr_out == 48000 and len(data) == n * 3

    def test_infer_dir_mode_serves_all(self, tmp_path, rng):
        # --input_dir routes every wav through ServingPipeline
        import flowhigh_tpu.cli as cli

        in_dir = tmp_path / "wavs"
        out_dir = tmp_path / "out"
        in_dir.mkdir()
        lens = [8000, 16000, 12000]
        for i, n in enumerate(lens):
            wav = (rng.standard_normal(n) * 0.2 * 32767).astype(np.int16)
            wavfile.write(in_dir / f"clip{i}.wav", 16000, wav)
        rc = cli.main(["infer", "--input_dir", str(in_dir),
                       "--output_dir", str(out_dir),
                       "--time_step", "1", "--ode_method", "euler",
                       "--cfm_method", "independent_cfm_adaptive", "--tiny",
                       "--wire", "int16"])
        assert rc == 0
        for i, n in enumerate(lens):
            sr_out, data = wavfile.read(out_dir / f"clip{i}_48k.wav")
            assert sr_out == 48000 and len(data) == n * 3

    def test_infer_arg_validation(self, tmp_path):
        import flowhigh_tpu.cli as cli
        # neither or both input styles -> usage error, not a traceback
        assert cli.main(["infer", "--tiny"]) == 2
        assert cli.main(["infer", "--input", "a.wav", "--output", "b.wav",
                         "--input_dir", str(tmp_path), "--tiny"]) == 2
        assert cli.main(["infer", "--input_dir", str(tmp_path), "--tiny"]) == 2
        empty = tmp_path / "empty"
        empty.mkdir()
        assert cli.main(["infer", "--input_dir", str(empty),
                         "--output_dir", str(tmp_path / "o"), "--tiny"]) == 2

    def test_parser_surface(self):
        # the README-documented flag surface exists (reference README.md:69-78)
        import flowhigh_tpu.cli as cli
        p = cli.build_parser()
        args = p.parse_args([
            "infer", "--input", "a.wav", "--output", "b.wav",
            "--time_step", "4", "--ode_method", "euler",
            "--cfm_method", "independent_cfm_mix", "--sigma", "1e-4",
            "--architecture", "transformer", "--n_layers", "2"])
        assert args.time_step == 4 and args.sigma == pytest.approx(1e-4)
