#!/usr/bin/env python
"""Headline benchmark: end-to-end FlowHighSR.generate real-time factor.

Runs on whatever platform JAX picks (the real TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config #1 of BASELINE.json: single 10 s clip, 16 kHz -> 48 kHz,
transformer / independent_cfm_adaptive / euler / time_step=1, the full
pipeline (resample, mel, CFM solve, BigVGAN, spectral splice) as one XLA
program. The reference publishes no numbers (BASELINE.md); the driver's
north star is >50x real time per chip, so vs_baseline = RTF / 50.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# Best-effort progress for the stall watchdog: the axon tunnel has measured
# multi-minute PARTIAL outages where a device->host fetch never returns
# (PERF.md / CLAUDE.md rule 5) — a thread blocked in that fetch can hang
# this process past any driver deadline with ZERO lines emitted. The
# watchdog thread fires after WATCHDOG_S, prints whatever metrics completed
# (headline computed from partial reps if any), and hard-exits so the
# driver always gets a parseable last line.
WATCHDOG_S = 1500.0
_progress = {"times": [], "stage": "startup"}


def _watchdog():
    times = _progress["times"]
    if times:
        dt = sorted(times)[len(times) // 2]
        print(json.dumps({
            "metric": "generate_rtf_16k_to_48k_10s_euler1",
            "value": round(10.0 / dt, 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(10.0 / dt / 50.0, 3),
            "note": f"watchdog: tunnel stalled in stage "
                    f"'{_progress['stage']}' after {len(times)} reps",
        }), flush=True)
    else:
        print(json.dumps({
            "metric": "generate_rtf_16k_to_48k_10s_euler1",
            "error": f"tunnel stall in stage '{_progress['stage']}' "
                     f"(watchdog after {WATCHDOG_S:.0f}s)",
        }), flush=True)
    os._exit(0)


def main():
    import pathlib

    import jax

    wd = threading.Timer(WATCHDOG_S, _watchdog)
    wd.daemon = True
    wd.start()

    # persistent compile cache: the full fused pipeline takes minutes to
    # compile cold on TPU; warm runs load in seconds.
    cache = pathlib.Path(__file__).parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowhigh_tpu import FlowHighConfig, FlowHighSR

    seconds = 10.0
    in_sr = 16000
    reps = 9  # median over more reps: run-to-run spread is ~5%

    sr = FlowHighSR(FlowHighConfig(), cfm_method="independent_cfm_adaptive",
                    ode_method="euler", fused_vocoder=True)
    sr.init_params(jax.random.PRNGKey(0), fast=True)

    rng = np.random.default_rng(0)
    t = np.arange(int(in_sr * seconds)) / in_sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 880 * t)
             + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)

    # warm-up / compile (full host-side path, checks numerics)
    _progress["stage"] = "warmup_compile"
    out = sr.generate(audio, sr=in_sr, timestep=1)
    assert np.isfinite(out).all()

    # per-iteration scalar fetch: on this backend, queued-dispatch timing via
    # block_until_ready reports unreliable numbers (see PERF.md); fetching a
    # value each iteration measures true end-to-end serving latency (including
    # ~35 ms control RTT)
    import jax.numpy as jnp

    audio_dev = jnp.asarray(audio)[None, :]
    n_valid = jnp.asarray(len(audio))
    key = jax.random.PRNGKey(0)

    def run(k):
        out, n48, _stats = sr._generate_jit(
            sr.params, sr.melvoco.vocoder_params, audio_dev, n_valid, k,
            in_sr, 48000, 1, sr.cfm_method, sr.ode_method, 1.0, 1.0)
        return out

    _progress["stage"] = "latency_reps"
    _ = float(run(key).ravel()[0])  # warm
    times = _progress["times"]
    for i in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jax.random.fold_in(key, i)).ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    rtf = seconds / dt

    # null-program RTT (same fetch pattern, trivial program): the tunnel's
    # control round-trip floor, ~33-44 ms and WEATHER-DEPENDENT (PERF.md).
    # device_ms_per_clip = clip wall - null RTT isolates device-side code
    # progress from tunnel weather so round-over-round BENCH deltas aren't
    # conflated (VERDICT r4 weak #3).
    _progress["stage"] = "null_rtt"
    nul = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    _ = float(nul(x0))  # warm
    null_times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(nul(x0))
        null_times.append(time.perf_counter() - t0)
    null_ms = sorted(null_times)[len(null_times) // 2] * 1e3
    print(json.dumps({
        "metric": "device_ms_per_clip_10s_euler1",
        "value": round(dt * 1e3 - null_ms, 2),
        "unit": "ms",
        "null_rtt_ms": round(null_ms, 2),
    }))

    # sustained pipelined serving (secondary metric, printed FIRST — the
    # driver parses the LAST line): many async dispatches in flight, full
    # outputs downloaded on a fetch thread, wall-clock start->last byte.
    # Unlike the single-clip latency above, this amortizes the ~33 ms tunnel
    # control RTT across the pipeline and shows device-side progress that a
    # latency metric saturated by RTT cannot (VERDICT r3 weak #1).
    try:
        import queue

        from flowhigh_tpu.sr import _wire_int16

        n_clips = 12

        def run_sustained(wire):
            q = queue.Queue(maxsize=8)
            done, errs = [], []

            def fetcher():
                # keep draining even on error: a dead fetcher would leave
                # the dispatch loop blocked forever on the bounded q.put
                while True:
                    o = q.get()
                    if o is None:
                        return
                    try:
                        done.append(np.asarray(o))  # full audio download
                    except Exception as e:
                        errs.append(e)

            def run_w(k):
                out = run(k)
                return _wire_int16(out) if wire == "int16" else out

            th = threading.Thread(target=fetcher, daemon=True)
            _ = float(run_w(key).ravel()[0])  # warm + drain before timing
            th.start()
            t0 = time.perf_counter()
            for i in range(n_clips):
                q.put(run_w(jax.random.fold_in(key, 100 + i)))
            q.put(None)
            th.join()
            wall = time.perf_counter() - t0
            if errs:
                raise errs[0]
            assert len(done) == n_clips
            assert all(np.isfinite(o).all() for o in done)
            return n_clips * seconds / wall

        _progress["stage"] = "sustained_float32"
        print(json.dumps({
            "metric": "serving_sustained_rtf_16k_to_48k_10s_euler1",
            "value": round(run_sustained("float32"), 2),
            "unit": "x_realtime_per_chip",
        }))
        # int16 download wire (the reference's own output scale — its CLI
        # writes 16-bit wavs): half the device->host bytes. Measured +31%
        # on TRUE serving incl. uploads (scripts/bench_serving_pipeline.py,
        # PERF.md round-4); labeled separately to keep the float32 line
        # comparable across rounds.
        _progress["stage"] = "sustained_int16"
        print(json.dumps({
            "metric": "serving_sustained_int16_wire_rtf_10s_euler1",
            "value": round(run_sustained("int16"), 2),
            "unit": "x_realtime_per_chip",
        }))
    except Exception as e:  # never break the headline metric
        print(json.dumps({"metric": "serving_sustained_rtf_16k_to_48k_10s_euler1",
                          "error": str(e)[:200]}))

    # training-step throughput (bf16 amp default, PERF.md round-5): chained
    # dispatch with one loss fetch per group — the fit() steady state, which
    # fetches metrics every log_every steps. Same config as
    # scripts/bench_train.py so the persistent compile cache is shared.
    try:
        from flowhigh_tpu.config import TrainConfig
        from flowhigh_tpu.train import Trainer

        _progress["stage"] = "train_step"
        tcfg = FlowHighConfig().replace(train=TrainConfig(
            batch_size=32, num_train_steps=1000, num_warmup_steps=0))
        tr = Trainer(tcfg, cfm_method="independent_cfm_adaptive")
        state = tr.init_state(jax.random.PRNGKey(0))
        tb = {
            "wave": (rng.standard_normal((32, 144000)) * 0.3).astype(np.float32),
            "cond": (rng.standard_normal((32, 144000)) * 0.3).astype(np.float32),
            "lengths": np.full((32,), 144000, np.int32),
        }
        state, m = tr.train_step(state, tb)  # compile (cache-warm)
        assert np.isfinite(float(m["loss"]))
        dev_b = [jax.device_put(tb) for _ in range(2)]
        chain, groups, ttimes = 4, 5, []
        for g in range(groups):
            t0 = time.perf_counter()
            for j in range(chain):
                state, m = tr.train_step(state, dev_b[j % 2])
            _ = float(m["loss"])
            ttimes.append((time.perf_counter() - t0) / chain)
        step_ms = sorted(ttimes)[groups // 2] * 1e3
        print(json.dumps({
            "metric": "train_step_ms_b32_3s_bf16_chain4",
            "value": round(step_ms, 1),
            "unit": "ms",
            "clips_per_sec": round(32 / (step_ms / 1e3), 1),
        }))
    except Exception as e:  # never break the headline metric
        print(json.dumps({"metric": "train_step_ms_b32_3s_bf16_chain4",
                          "error": str(e)[:200]}))

    wd.cancel()
    print(json.dumps({
        "metric": "generate_rtf_16k_to_48k_10s_euler1",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
