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

    out = stream.generate(audio, in_sr, timestep=1)  # warm-up / compile
    assert np.isfinite(out).all() and out.shape[-1] == n * 3

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = stream.generate(audio, in_sr, timestep=1, seed=i)
        # output is host numpy already — wall time IS end-to-end time
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    rtf = (60 * minutes) / dt
    print(json.dumps({
        "metric": "streaming_rtf_16k_to_48k_5min_euler1",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
    }))


if __name__ == "__main__":
    main()
