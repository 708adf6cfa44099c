"""Sustained concurrent-clip serving: submit() -> Future pipeline.

New capability vs the reference, whose serving surface is one blocking
clip at a time (reference: example.py:1-13, app.py:8-19 — each request
runs ``generate`` synchronously end to end). On a TPU reached over a
network/tunnel, a single-clip loop serializes three things that can
overlap: the host->device upload, the device compute, and the
device->host download. The measured-optimal structure (PERF.md round-4:
sustained 107.8x vs 85.98x single-clip on identical programs) keeps
several async-dispatched clips in flight, with every blocking transfer
owned by a dedicated thread:

    submit() -> [uploader thread: pad -> device_put]
             -> [dispatch thread: key -> async dispatch]
             -> [fetch thread: download -> trim -> Future.set_result]

(Round 5 split the round-4 feeder into uploader + dispatcher: the ~35
ms/clip host->device upload serialized against the ~10 ms dispatch
control on one thread — PERF.md round-4 measured exactly that gap
between true serving and the upload-free sustained loop. The thread
trio lives in ``pipeline.StagePipeline``; ``StreamingSR`` rides the
same core for long-form chunks.)

``ServingPipeline`` packages that structure behind a small API::

    with ServingPipeline(model) as srv:
        futs = [srv.submit(a, 16000) for a in clips]
        outs = [f.result() for f in futs]

Each request is padded to the same 1 s output buckets as
``FlowHighSR.generate`` and dispatched alone (B=1): one 10 s clip
already fills a v5e chip, so batching is measured SLOWER per clip and
throughput comes from pipelined dispatch (PERF.md). A request with a new
(input_rate, bucket) shape compiles a program on first use — call
``warmup`` for each expected shape before accepting traffic.
"""

from __future__ import annotations

import math
import threading
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

import jax

from .pipeline import StagePipeline
from .sr import BUCKET_SAMPLES, FlowHighSR, _warn_if_unconverged, _wire_int16


class ServingPipeline:
    def __init__(self, model: FlowHighSR, max_in_flight: int = 8,
                 wire: str = "float32", target_sampling_rate: int = 48000,
                 timestep: int = 1, seed: int = 0):
        """``max_in_flight`` bounds dispatched-but-unfetched clips (device
        HBM backpressure, like StreamingSR.pipeline_depth).

        ``wire='int16'`` downloads waveforms device-quantized to int16
        (round(clip(x)*32767), the reference's wav scale —
        bigvgan/inference.py:66, meldataset.py:22): half the
        device->host bytes; results are converted back to float32. The
        error is pure -96 dBFS quantization (<= 0.5/32767 per sample):
        the splice's x0.99 peak-norm bounds every served output, so the
        wire's clip() never engages on this path (pinned on hot material
        by tests/test_metrics_streaming.py::TestInt16WireHotMaterial).

        ``seed`` salts the per-request default keys: request i uses
        fold_in(PRNGKey(seed), i) unless ``submit(..., seed=...)`` pins
        an explicit one.

        Long-running deployments: soak-tested flat at the device rate
        (116-117x per minute over 20 min, scripts/soak_serving.py). On
        the TUNNELED dev backend the client layer retains ~0.8 MB of
        host memory per clip under this concurrent thread structure
        (attributed to the axon PJRT client: every single-threaded
        operation is leak-free, jax.live_arrays() stays flat, gc and
        MALLOC_ARENA_MAX=1 change nothing — PERF.md round-5 /
        scripts/probe_rss_leak.py); budget host RAM or recycle the
        process accordingly there. Not reproduced on the in-process
        CPU backend (tests/test_serving.py soak smoke).
        """
        if max_in_flight < 1:
            raise ValueError(f"max_in_flight must be >= 1, got {max_in_flight}")
        if wire not in ("float32", "int16"):
            raise ValueError(f"wire must be 'float32' or 'int16', got {wire!r}")
        self.model = model
        self.wire = wire
        self.target_sampling_rate = int(target_sampling_rate)
        self.timestep = int(timestep)
        self._base_key = jax.random.PRNGKey(seed)
        self._n_submitted = 0
        self._closed = False
        self._lock = threading.Lock()
        # submit queue is unbounded: submit() never blocks. The
        # upload->dispatch queue holds a few staged device inputs so a
        # slow upload never starves the dispatcher; the dispatch->fetch
        # depth caps dispatched-but-unfetched device work (HBM
        # backpressure, like StreamingSR.pipeline_depth).
        self._pipe = StagePipeline(
            [self._upload, self._dispatch, self._fetch],
            depths=[4, max_in_flight])

    # -- request side -----------------------------------------------------

    def submit(self, audio: np.ndarray, sr: int,
               seed: Optional[int] = None) -> Future:
        """[T] or [1, T] waveform at ``sr`` -> Future of [1, T'] float32 at
        ``target_sampling_rate``. Same audio conventions as
        ``FlowHighSR.generate`` (reference flowhighsr.py:51-63): 2-D input
        takes row 0, int16-scale input is divided by 32768.

        With an explicit ``seed``, the result is identical to
        ``model.generate(audio, sr, seed=seed)`` (same program, same key).

        int16-dtype input rides the int16 INPUT wire: the raw samples are
        uploaded as-is (half the bytes) and cast+scaled on device — still
        bit-identical to the float path, since int16 is exact in float32
        and /32768 is a power of two. int16 dtype is ALWAYS interpreted
        as PCM scale (/32768), even for near-silent arrays whose
        |max| <= 1 (the float path's max>1 heuristic never applies).
        """
        audio = np.asarray(audio)
        if audio.ndim == 2:
            audio = audio[0]
        if audio.ndim != 1:
            raise ValueError(f"audio must be [T] or [1, T], got {audio.shape}")
        if len(audio) == 0:
            raise ValueError("audio is empty")
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("ServingPipeline is closed")
            req_id = self._n_submitted
            self._n_submitted += 1
            self._pipe.put((fut, audio, int(sr), seed, req_id))
        return fut

    def generate_many(self, audios: Sequence[np.ndarray], srs,
                      seeds=None) -> list:
        """Convenience: submit all, gather in order. ``srs`` may be one int
        or a per-clip sequence; ``seeds`` likewise (None = salted default)."""
        if isinstance(srs, int):
            srs = [srs] * len(audios)
        if seeds is None or isinstance(seeds, int):
            seeds = [seeds] * len(audios)
        futs = [self.submit(a, r, s) for a, r, s in zip(audios, srs, seeds)]
        return [f.result() for f in futs]

    def warmup(self, sr: int, seconds: float, dtype=np.float32) -> None:
        """Compile (or load from the persistent cache) the program for one
        (rate, bucket, input dtype) shape before serving traffic: the cold
        compile of the full fused pipeline takes minutes on a tunneled TPU.
        Pass ``dtype=np.int16`` to warm the int16 input-wire program."""
        n = int(sr * seconds)
        self.submit(np.zeros(max(n, 1), dtype), sr, seed=0).result()

    # -- pipeline stages (each runs on its own StagePipeline thread) --------

    def _upload(self, item):
        """Pad to the output bucket and stage on device. Owns every
        blocking host->device transfer (one combined put per request —
        each separate put costs a ~30 ms control round-trip on tunneled
        deployments, PERF.md round-4)."""
        fut, audio, sr, seed, req_id = item
        try:
            int16_in = audio.dtype == np.int16
            if not int16_in and np.abs(audio).max() > 1:
                audio = audio / 32768.0
            n = len(audio)
            in_bucket = BUCKET_SAMPLES * sr // self.target_sampling_rate
            if in_bucket <= 0:
                raise ValueError(
                    f"input rate {sr} too low for target "
                    f"{self.target_sampling_rate}")
            n_pad = max(in_bucket, math.ceil(n / in_bucket) * in_bucket)
            padded = np.zeros(n_pad,
                              np.int16 if int16_in else np.float32)
            padded[:n] = audio
            arr_d, n_d = jax.device_put(
                (padded[None, :], np.asarray(n)))
            key = (jax.random.PRNGKey(seed) if seed is not None
                   else jax.random.fold_in(self._base_key, req_id))
        except Exception as e:
            fut.set_exception(e)
            return None
        return (fut, arr_d, n_d, key, sr, int16_in)

    def _dispatch(self, item):
        """Async-dispatch the jitted program on staged device input (~10 ms
        dispatch control RTT; never waits on uploads or downloads)."""
        fut, arr_d, n_d, key, sr, int16_in = item
        m = self.model
        try:
            std_1, std_2 = m._default_stds()
            gen = m._generate_jit_i16 if int16_in else m._generate_jit
            out, n48, stats = gen(
                m.params, m.melvoco.vocoder_params, arr_d, n_d, key,
                sr, self.target_sampling_rate, self.timestep,
                m.cfm_method, m.ode_method, float(std_1), float(std_2))
            if self.wire == "int16":
                out = _wire_int16(out)
        except Exception as e:
            fut.set_exception(e)
            return None
        return (fut, out, n48, stats)

    def _fetch(self, item):
        """Download, trim, resolve the Future. Owns every blocking
        device->host transfer."""
        fut, out, n48, stats = item
        try:
            _warn_if_unconverged(stats)
            out_np = np.asarray(out)
            if out_np.dtype == np.int16:
                out_np = out_np.astype(np.float32) / 32767.0
            fut.set_result(out_np[:, : int(np.asarray(n48)[0])])
        except Exception as e:  # keep draining; this request only
            fut.set_exception(e)
        return None

    # -- lifecycle ---------------------------------------------------------

    def close(self):
        """Drain every submitted request, then stop the worker threads.
        Idempotent; ``submit`` after close raises."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._pipe.close()

    def __enter__(self) -> "ServingPipeline":
        return self

    def __exit__(self, *exc):
        self.close()
