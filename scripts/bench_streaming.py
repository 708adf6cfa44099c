#!/usr/bin/env python
"""Long-form streaming benchmark — BASELINE config #5: a 5-minute 16 kHz clip
through StreamingSR's chunked overlap-add path on the real TPU.

Prints one JSON line {"metric", "value", "unit"}. Run from the repo root
(uses the same persistent compile cache as bench.py)."""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowhigh_tpu import FlowHighConfig, FlowHighSR
    from flowhigh_tpu.streaming import StreamingSR

    minutes = 5.0
    in_sr = 16000

    model = FlowHighSR(FlowHighConfig(), cfm_method="independent_cfm_adaptive",
                       ode_method="euler", fused_vocoder=True)
    model.init_params(jax.random.PRNGKey(0), fast=True)
    stream = StreamingSR(model)  # measured-optimal defaults (10 s chunks, B=1)

    rng = np.random.default_rng(0)
    n = int(in_sr * 60 * minutes)
    t = np.arange(n) / in_sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 880 * t)
             + 0.01 * rng.standard_normal(n)).astype(np.float32)

    # full-duplex 16-bit arm: int16 INPUT wire (raw PCM uploads, halved —
    # 11 MB instead of 22 MB for 5 min @ 16 kHz) + int16 download wire.
    # The production config for 16-bit sources; bit-identical input path.
    stream_i16 = StreamingSR(model, wire="int16")
    audio_i16 = np.clip(np.round(audio * 32768.0),
                        -32768, 32767).astype(np.int16)

    out = stream.generate(audio, in_sr, timestep=1)  # warm-up / compile
    assert np.isfinite(out).all() and out.shape[-1] == n * 3
    out = stream_i16.generate(audio_i16, in_sr, timestep=1)  # warm i16 duplex
    assert np.isfinite(out).all()

    # serving-reference arm: the SAME 10 s-chunk program pumped upload-free
    # (pre-staged device input, async dispatch, fetch thread) — bench.py's
    # sustained-serving structure. Streaming's structural ceiling vs this
    # arm is output/compute = 300/340 = 0.88: the 1 s crossfade overlap
    # reprocesses 34x10 s of audio for 300 s of output. The ratio below is
    # the honest "did the pipeline close the non-structural gap" number.
    import queue
    import threading

    import jax.numpy as jnp

    chunk_n = int(10.0 * in_sr)
    chunk_dev = jnp.asarray(audio[:chunk_n])[None, :]
    lens_dev = jnp.asarray(np.array([chunk_n], np.int32))
    n_serving = 30  # 300 s of output, like the streaming arms

    def serving_ref(seed):
        key = jax.random.PRNGKey(seed)
        q: "queue.Queue" = queue.Queue(maxsize=8)
        done = []

        def fetcher():
            while True:
                o = q.get()
                if o is None:
                    return
                done.append(np.asarray(o))

        def run(k):
            out, _, _ = model.dispatch_generate(
                chunk_dev, lens_dev, in_sr, 48000, 1, key=k)
            return out

        _ = float(run(key).ravel()[0])  # warm + drain
        th = threading.Thread(target=fetcher, daemon=True)
        th.start()
        t0 = time.perf_counter()
        for i in range(n_serving):
            q.put(run(jax.random.fold_in(key, i)))
        q.put(None)
        th.join()
        wall = time.perf_counter() - t0
        assert len(done) == n_serving
        return wall

    # arms interleaved: tunnel-RTT weather drifts +-30% within an hour and
    # multi-minute stalls occur — 5 reps so one stalled rep can't own the
    # median (round-5: a stall poisoned 2 of 3 reps in one sample)
    times = {"float32": [], "int16": [], "serving_ref": []}
    for i in range(5):
        for wire, s, a in (("float32", stream, audio),
                           ("int16", stream_i16, audio_i16)):
            t0 = time.perf_counter()
            out = s.generate(a, in_sr, timestep=1, seed=i)
            # output is host numpy already — wall time IS end-to-end time
            times[wire].append(time.perf_counter() - t0)
        times["serving_ref"].append(serving_ref(i))
    for wire, metric in (("float32", "streaming_rtf_16k_to_48k_5min_euler1"),
                         ("int16", "streaming_int16_duplex_rtf_5min_euler1"),
                         ("serving_ref", "serving_ref_rtf_same_window")):
        dt = sorted(times[wire])[len(times[wire]) // 2]
        print(json.dumps({
            "metric": metric,
            "value": round((60 * minutes) / dt, 2),
            "unit": "x_realtime_per_chip",
        }))
    med = lambda xs: sorted(xs)[len(xs) // 2]
    ratio = med(times["serving_ref"]) / med(times["float32"])
    print(json.dumps({"metric": "streaming_over_serving_ratio",
                      "value": round(ratio, 3),
                      "structural_ceiling": round(300.0 / 340.0, 3)}))


if __name__ == "__main__":
    main()
