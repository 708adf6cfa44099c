"""One decisive e2e A/B for the subtile kernel pipeline (round 4): the full
generate program with vocoder_kernel_pipeline in {1, 2}, timed like bench.py
(median per-iteration value fetch). Two compiles total instead of the
48-program microbench sweep that timed out on server-side recompiles.

Run on the real TPU: python scripts/bench_e2e_pipeline.py [pipe ...]
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
    rng = np.random.default_rng(0)
    t = np.arange(int(in_sr * seconds)) / in_sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
    audio_dev = jnp.asarray(audio)[None, :]
    n_valid = jnp.asarray(len(audio))
    key = jax.random.PRNGKey(0)

    pipes = [int(a) for a in sys.argv[1:]] or [1, 2]
    outs = {}
    for pipe in pipes:
        sr = FlowHighSR(FlowHighConfig(),
                        cfm_method="independent_cfm_adaptive",
                        ode_method="euler", fused_vocoder=True,
                        vocoder_kernel_pipeline=pipe)
        sr.init_params(jax.random.PRNGKey(0), fast=True)

        def run(k):
            out, n48, _ = sr._generate_jit(
                sr.params, sr.melvoco.vocoder_params, audio_dev, n_valid, k,
                in_sr, 48000, 1, sr.cfm_method, sr.ode_method, 1.0, 1.0)
            return out

        _ = float(run(key).ravel()[0])  # compile
        times = []
        for i in range(12):
            t0 = time.perf_counter()
            _ = float(run(jax.random.fold_in(key, i)).ravel()[0])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        outs[pipe] = np.asarray(run(key))
        print(json.dumps({"pipe": pipe, "ms": round(dt * 1e3, 2),
                          "rtf": round(seconds / dt, 2)}), flush=True)

    if len(outs) > 1:
        ks = sorted(outs)
        ref = outs[ks[0]]
        for k in ks[1:]:
            print(f"max|pipe{ks[0]} - pipe{k}| = "
                  f"{np.abs(ref - outs[k]).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
