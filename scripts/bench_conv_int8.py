"""Decisive e2e A/B for int8 packed-conv dots (round 5): the full generate
program with vocoder_conv_dtype in {f32, int8}, 2 compiles total, timed like
bench.py (median per-iteration value fetch) with the measurement reps of the
two arms INTERLEAVED so tunnel-RTT weather hits both equally (the round-4
serving-wire protocol). Also prints the max|f32 - int8| waveform delta at
fast-init weights (the QUALITY bound lives in tests/test_lsd_battery.py at
realistic statistics, not here).

Run on the real TPU: python scripts/bench_conv_int8.py
"""
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
    import jax.numpy as jnp

    from flowhigh_tpu import FlowHighConfig, FlowHighSR

    seconds, in_sr = 10.0, 16000
    reps = 12
    rng = np.random.default_rng(0)
    t = np.arange(int(in_sr * seconds)) / in_sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
    audio_dev = jnp.asarray(audio)[None, :]
    n_valid = jnp.asarray(len(audio))
    key = jax.random.PRNGKey(0)

    arms = {"f32": None, "int8": jnp.int8}
    runners, outs = {}, {}
    for name, dt in arms.items():
        sr = FlowHighSR(FlowHighConfig(),
                        cfm_method="independent_cfm_adaptive",
                        ode_method="euler", fused_vocoder=True,
                        vocoder_conv_dtype=dt)
        sr.init_params(jax.random.PRNGKey(0), fast=True)

        def run(k, sr=sr):
            out, n48, _ = sr._generate_jit(
                sr.params, sr.melvoco.vocoder_params, audio_dev, n_valid, k,
                in_sr, 48000, 1, sr.cfm_method, sr.ode_method, 1.0, 1.0)
            return out

        t0 = time.perf_counter()
        outs[name] = np.asarray(run(key))  # compile + full fetch
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)
        runners[name] = run

    # interleaved timed reps: weather-fair
    times = {name: [] for name in arms}
    for i in range(reps):
        for name, run in runners.items():
            t0 = time.perf_counter()
            _ = float(run(jax.random.fold_in(key, i)).ravel()[0])
            times[name].append(time.perf_counter() - t0)
    for name in arms:
        dt = sorted(times[name])[reps // 2]
        print(json.dumps({"arm": name, "ms": round(dt * 1e3, 2),
                          "rtf": round(seconds / dt, 2)}), flush=True)
    d = np.abs(outs["f32"] - outs["int8"]).max()
    print(f"max|f32 - int8| waveform delta (fast-init weights) = {d:.3e}",
          flush=True)


if __name__ == "__main__":
    main()
