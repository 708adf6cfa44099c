"""Long-form streaming inference: chunked generate + overlap-add stitching.

New capability vs the reference, which pushes entire clips through dense
attention in one shot — a 5-minute clip is 30 000 mel frames of quadratic
attention (reference: src/flowhigh/flowhighsr.py:59-101, attend.py:123-137).
Here long audio is processed in fixed-size chunks (one compiled XLA program,
reused for every chunk), each chunk runs the full pipeline including the
spectral low-band splice, and chunks are stitched with an equal-power
crossfade over the overlap region.

Alternative: ``FlowHighSR.generate_longform`` — the single-pass mode: the
CFM solves over the FULL clip in one program (O(N)-memory flash attention
with ``ModelConfig(attn_flash=True)`` on TPU), only the vocoder chunks
(bit-exactly), so there are no CFM seams at all. StreamingSR remains the
constant-memory/latency-pipelined serving path; seam quality of the two is
compared by tests/test_metrics_streaming.py::TestLongform.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .sr import FlowHighSR


class StreamingSR:
    def __init__(self, model: FlowHighSR, chunk_seconds: float = 10.0,
                 overlap_seconds: float = 1.0, batch_size: int = 1,
                 pipeline_depth: int = 8, wire: str = "float32"):
        """``batch_size=1`` and 10 s chunks are the measured optimum on one
        v5e chip: a single 10 s chunk already fills the chip (B=4 batching
        measured 39x vs 48x per-clip after the packed-vocoder work; 20 s
        chunks measured 44.4x vs 45.8x), so throughput comes from pipelined
        dispatch — several chunks in flight — not from batching.

        ``pipeline_depth`` bounds the dispatched-but-unfetched batches in
        flight (device HBM backpressure): device->host downloads run on a
        dedicated fetch thread so they overlap both compute and the next
        dispatches instead of serializing the dispatch loop (round-3's
        in-loop ``np.asarray`` stalled dispatch once per depth-4 window).

        ``wire='int16'`` downloads chunk waveforms as device-quantized int16
        (round(clip(x)*32767), the reference's wav scale) — half the
        device->host bytes per chunk on networked/tunneled deployments; the
        stitcher converts back to float before the crossfade. The error is
        pure -96 dBFS quantization: each chunk is splice-peak-normed to
        0.99 so the wire's clip() never engages, and the crossfade is a
        convex combination of per-chunk quantized samples, so the stitched
        error keeps the same <= 0.5/32767-per-sample bound (pinned on hot
        material by tests/test_metrics_streaming.py::
        TestInt16WireHotMaterial)."""
        assert overlap_seconds < chunk_seconds / 2
        if pipeline_depth < 1:
            raise ValueError(
                f"pipeline_depth must be >= 1, got {pipeline_depth} "
                "(0 would make the dispatch queue unbounded, removing the "
                "HBM backpressure it exists to provide)")
        self.model = model
        self.chunk_seconds = chunk_seconds
        self.overlap_seconds = overlap_seconds
        self.batch_size = batch_size  # chunks per device batch
        self.pipeline_depth = pipeline_depth
        if wire not in ("float32", "int16"):
            raise ValueError(f"wire must be 'float32' or 'int16', got {wire!r}")
        self.wire = wire
        self._sharded_fns: dict = {}  # (mesh id, sr, target, step) -> fn

    def generate(self, audio: np.ndarray, sr: int,
                 target_sampling_rate: int = 48000, timestep: int = 1,
                 seed: int = 0) -> np.ndarray:
        """[T] any-rate waveform -> [1, T * target/sr] at 48 kHz.

        int16-dtype input rides the int16 INPUT wire end to end: raw int16
        chunks are uploaded (half the host->device bytes — a 5-min 16 kHz
        source uploads 11 MB instead of 22 MB through the tunnel) and
        cast+scaled on device, bit-identical to the float path (int16 is
        exact in float32, /32768 is a power of two). Like generate()/
        ServingPipeline, int16 dtype is ALWAYS interpreted as PCM scale.
        Combined with ``wire='int16'`` downloads this is the full-duplex
        16-bit serving config for PCM sources."""
        audio = np.asarray(audio)
        if audio.ndim == 2:
            audio = audio[0]
        int16_in = audio.dtype == np.int16
        if not int16_in and np.abs(audio).max() > 1:
            audio = audio / 32768.0

        n = len(audio)
        chunk_in = int(self.chunk_seconds * sr)
        overlap_in = int(self.overlap_seconds * sr)
        hop_in = chunk_in - overlap_in

        if n <= chunk_in:
            return self.model.generate(audio, sr, target_sampling_rate,
                                       timestep, seed)

        ratio = target_sampling_rate // math.gcd(target_sampling_rate, sr)
        den = sr // math.gcd(target_sampling_rate, sr)
        def to_out(x: int) -> int:
            return x * ratio // den

        n_chunks = 1 + math.ceil((n - chunk_in) / hop_in)
        total_out = to_out(n)

        # all chunks share one shape -> process them in device batches: the
        # control round trip amortizes and the chip fills better. Batches are
        # DISPATCHED ahead (async JAX dispatch, ``pipeline_depth`` in flight)
        # and fetched in order, so host->device uploads and device->host
        # downloads overlap compute instead of serializing per batch — the
        # round-1 streaming path was host-transfer-bound.
        seg_dtype = np.int16 if int16_in else np.float32
        segs = []
        for c in range(n_chunks):
            seg = audio[c * hop_in : c * hop_in + chunk_in]
            if len(seg) < chunk_in:
                seg = np.pad(seg, (0, chunk_in - len(seg)))
            segs.append(seg.astype(seg_dtype))

        from .sr import _warn_if_unconverged
        from .pipeline import StagePipeline

        import jax

        starts = list(range(0, n_chunks, self.batch_size))
        ys: list = []
        # the shared uploader -> dispatcher -> fetcher thread trio
        # (pipeline.StagePipeline, same core as ServingPipeline): one
        # thread owns each blocking tunnel operation so uploads, dispatch
        # control RTTs and downloads overlap; the dispatch->fetch depth
        # bounds batches in flight (device HBM backpressure). FIFO order
        # is preserved, so ys arrives in chunk order for the stitcher.
        #
        # per-batch keys: ONE split up front instead of a PRNGKey program
        # dispatch per chunk
        keys = jax.random.split(jax.random.PRNGKey(seed), len(starts))
        lens_d = jax.device_put(
            np.full((self.batch_size,), chunk_in, np.int32))

        def upload(item):
            bi, b0 = item
            batch = segs[b0 : b0 + self.batch_size]
            nb = len(batch)
            if nb < self.batch_size:
                # pad rows so every batch reuses ONE compiled program
                batch = batch + [np.zeros(chunk_in, seg_dtype)] * (
                    self.batch_size - nb)
            return (bi, jax.device_put(np.stack(batch)), nb)

        def dispatch(item):
            bi, arr_d, nb = item
            out_d, _, stats = self.model.dispatch_generate(
                arr_d, lens_d, sr, target_sampling_rate, timestep,
                key=keys[bi], wire=self.wire)
            return (out_d, nb, stats)

        def fetch(item):
            out_d, nb, stats = item
            _warn_if_unconverged(stats)
            out_np = np.asarray(out_d)
            if out_np.dtype == np.int16:
                out_np = out_np.astype(np.float32) / 32767.0
            ys.extend(out_np[i] for i in range(nb))

        pipe = StagePipeline([upload, dispatch, fetch],
                             depths=[4, self.pipeline_depth])
        for bi, b0 in enumerate(starts):
            pipe.put((bi, b0))
        pipe.close()
        if pipe.stage_errors:
            raise pipe.stage_errors[0]

        return self._stitch(ys, n_chunks, hop_in, chunk_in, overlap_in,
                            to_out, total_out)

    @staticmethod
    def _stitch(ys, n_chunks: int, hop_in: int, chunk_in: int,
                overlap_in: int, to_out, total_out: int) -> np.ndarray:
        """Overlap-add the per-chunk 48 kHz waveforms with an equal-power
        (sin^2) crossfade over the overlap region; interior samples (where
        only one chunk contributes, weight 1) pass through bit-exactly."""
        out = np.zeros(total_out, np.float32)
        weight = np.zeros(total_out, np.float32)
        overlap_out = to_out(overlap_in)
        ramp = np.sin(0.5 * np.pi * np.linspace(0, 1, overlap_out)) ** 2
        for c in range(n_chunks):
            start = c * hop_in
            y = ys[c][: to_out(chunk_in)]

            w = np.ones(len(y), np.float32)
            if c > 0:
                w[:overlap_out] = ramp
            if c < n_chunks - 1:
                w[len(y) - overlap_out :] = ramp[::-1]
            o0 = to_out(start)
            o1 = min(o0 + len(y), total_out)
            out[o0:o1] += (y * w)[: o1 - o0]
            weight[o0:o1] += w[: o1 - o0]

        out = out / np.maximum(weight, 1e-8)
        return out[None, :]

    def generate_sharded(self, audio: np.ndarray, sr: int, mesh,
                         target_sampling_rate: int = 48000,
                         timestep: int = 1, seed: int = 0) -> np.ndarray:
        """Chunk-parallel long-form over a device mesh: ONE clip's chunks
        sharded across the ``data`` axis (the CP analog of SURVEY §2.4 —
        the reference processes whole clips on one device), stitched on
        host with the same equal-power crossfade as ``generate``.

        The chunk rows ride ``FlowHighSR.make_sharded_generate`` — each
        chip runs the full single-chip pipeline on its rows, no
        collectives. Per-chip RTF math: with C chunks over D chips and
        t_chunk per-chunk device time, device wall is
        ceil(C/D) * t_chunk — a 5-min clip (C=34 at 10 s chunks / 1 s
        overlap) on an 8-chip v5e slice runs ceil(34/8)=5 chunk-times
        ~= 8x faster than one chip, i.e. ~500x realtime at the measured
        86 ms/chunk, until the host upload/stitch (O(C), ~3.5 s/74 MB
        through a tunnel) dominates.

        Chunk count is padded up to a multiple of the data-axis size with
        zero rows (discarded after); every call with the same
        (mesh, sr, target, timestep) reuses one compiled program.
        int16 input is converted on host (PCM scale) — the sharded program
        is float-only."""
        audio = np.asarray(audio)
        if audio.ndim == 2:
            audio = audio[0]
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        elif np.abs(audio).max() > 1:
            audio = audio / 32768.0

        n = len(audio)
        chunk_in = int(self.chunk_seconds * sr)
        overlap_in = int(self.overlap_seconds * sr)
        hop_in = chunk_in - overlap_in

        if n <= chunk_in:
            return self.model.generate(audio, sr, target_sampling_rate,
                                       timestep, seed)

        ratio = target_sampling_rate // math.gcd(target_sampling_rate, sr)
        den = sr // math.gcd(target_sampling_rate, sr)
        def to_out(x: int) -> int:
            return x * ratio // den

        n_chunks = 1 + math.ceil((n - chunk_in) / hop_in)
        segs = []
        for c in range(n_chunks):
            seg = audio[c * hop_in : c * hop_in + chunk_in]
            if len(seg) < chunk_in:
                seg = np.pad(seg, (0, chunk_in - len(seg)))
            segs.append(seg.astype(np.float32))

        n_data = mesh.shape["data"]
        n_rows = math.ceil(n_chunks / n_data) * n_data
        segs += [np.zeros(chunk_in, np.float32)] * (n_rows - n_chunks)

        # key by mesh STRUCTURE (axes + device ids), not id(mesh): a GC'd
        # mesh's address can be reused by a different mesh
        mesh_key = (tuple(mesh.shape.items()),
                    tuple(d.id for d in mesh.devices.flat))
        cache_key = (mesh_key, sr, target_sampling_rate, timestep)
        fn = self._sharded_fns.get(cache_key)
        if fn is None:
            fn = self.model.make_sharded_generate(
                mesh, in_sr=sr, target_sampling_rate=target_sampling_rate,
                timestep=timestep)
            self._sharded_fns[cache_key] = fn
        out_d, _ = fn(np.stack(segs), np.full(n_rows, chunk_in, np.int32),
                      seed=seed)
        ys = list(np.asarray(out_d)[:n_chunks])

        return self._stitch(ys, n_chunks, hop_in, chunk_in, overlap_in,
                            to_out, to_out(n))
