#!/usr/bin/env python
"""A/B the packed-conv MXU contraction dtype (f32 vs bf16, f32 accumulate)
on the full generate program, plus the waveform/LSD cost of the rounding.

Round-2 measured f32 dots == bf16 when the conv kernels were bandwidth-bound
(PERF.md round-2). The round-3 trace shows the packed convs are now
MXU-compute-bound (dense [pC, pC] tap blocks carry ~p x redundant FLOPs), so
bf16's ~2x MXU rate is worth a re-measure. Prints one JSON line per arm.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowhigh_tpu import FlowHighConfig, FlowHighSR
    from flowhigh_tpu.metrics import log_spectral_distance

    seconds, in_sr, reps = 10.0, 16000, 9
    rng = np.random.default_rng(0)
    t = np.arange(int(in_sr * seconds)) / in_sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 880 * t)
             + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)

    outs = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        sr = FlowHighSR(FlowHighConfig(),
                        cfm_method="independent_cfm_adaptive",
                        ode_method="euler", fused_vocoder=True,
                        vocoder_conv_dtype=dt)
        sr.init_params(jax.random.PRNGKey(0), fast=True)
        out = sr.generate(audio, sr=in_sr, timestep=1)
        assert np.isfinite(out).all()
        outs[name] = np.asarray(out).ravel()

        audio_dev = jnp.asarray(audio)[None, :]
        n_valid = jnp.asarray(len(audio))
        key = jax.random.PRNGKey(0)

        # same stds as sr.generate() so the timed program is the cached one
        # whose output is compared (stds are static jit args)
        std_1, std_2 = sr._default_stds()

        def run(k):
            out, _n48, _s = sr._generate_jit(
                sr.params, sr.melvoco.vocoder_params, audio_dev, n_valid, k,
                in_sr, 48000, 1, sr.cfm_method, sr.ode_method, std_1, std_2)
            return out

        _ = float(run(key).ravel()[0])
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            _ = float(run(jax.random.fold_in(key, i)).ravel()[0])
            times.append(time.perf_counter() - t0)
        dt_med = sorted(times)[len(times) // 2]
        print(json.dumps({"arm": name, "rtf": round(seconds / dt_med, 2),
                          "ms": round(dt_med * 1e3, 1)}), flush=True)

    n = min(len(outs["f32"]), len(outs["bf16"]))
    a, b = outs["f32"][:n], outs["bf16"][:n]
    print(json.dumps({
        "metric": "bf16_conv_dtype_delta",
        "max_abs_diff": float(np.abs(a - b).max()),
        "lsd_db": round(float(log_spectral_distance(a[None, :], b[None, :])[0]), 4),
        # rounding cost is measured on fast-init random params; trained
        # weights have different activation magnitudes and may differ
        "params": "fast_init",
    }))


if __name__ == "__main__":
    main()
