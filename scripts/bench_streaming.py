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

    stream_i16 = StreamingSR(model, wire="int16")

    out = stream.generate(audio, in_sr, timestep=1)  # warm-up / compile
    assert np.isfinite(out).all() and out.shape[-1] == n * 3
    out = stream_i16.generate(audio, in_sr, timestep=1)  # warm int16 program
    assert np.isfinite(out).all()

    # arms interleaved: tunnel-RTT weather drifts +-30% within an hour
    times = {"float32": [], "int16": []}
    for i in range(3):
        for wire, s in (("float32", stream), ("int16", stream_i16)):
            t0 = time.perf_counter()
            out = s.generate(audio, in_sr, timestep=1, seed=i)
            # output is host numpy already — wall time IS end-to-end time
            times[wire].append(time.perf_counter() - t0)
    for wire, metric in (("float32", "streaming_rtf_16k_to_48k_5min_euler1"),
                         ("int16", "streaming_int16_wire_rtf_5min_euler1")):
        dt = sorted(times[wire])[len(times[wire]) // 2]
        print(json.dumps({
            "metric": metric,
            "value": round((60 * minutes) / dt, 2),
            "unit": "x_realtime_per_chip",
        }))


if __name__ == "__main__":
    main()
