"""Sustained-serving A/B: float32 vs int16 download wire.

The sustained pipelined serving loop (bench.py second metric) downloads the
FULL 48 kHz output per clip. At 10 s that is 1.92 MB float32 through the
tunnel (~21 MB/s measured in CLAUDE.md) ~= 91 ms/clip — the same order as
the ~86 ms device time, so the download can bind the sustained rate. The
int16 wire (sr.py _wire_int16: round(clip(x)*32767), the reference's own
output scale — its CLI writes 16-bit WAV via MAX_WAV_VALUE, reference
bigvgan/inference.py:66, meldataset.py:22) halves the bytes.

Arms are INTERLEAVED (f32, i16, f32, i16, ...) so tunnel-RTT weather hits
both equally (CLAUDE.md: RTT drifts +-30% within an hour; never A/B across
half-hours).
"""
import json
import pathlib
import queue
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

cache = pathlib.Path("/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from flowhigh_tpu import FlowHighConfig, FlowHighSR
from flowhigh_tpu.sr import _wire_int16

seconds, in_sr, n_clips, rounds = 10.0, 16000, 12, 3

sr = FlowHighSR(FlowHighConfig(), cfm_method="independent_cfm_adaptive",
                ode_method="euler", fused_vocoder=True)
sr.init_params(jax.random.PRNGKey(0), fast=True)

rng = np.random.default_rng(0)
t = np.arange(int(in_sr * seconds)) / in_sr
audio = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 880 * t)
         + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
audio_dev = jnp.asarray(audio)[None, :]
n_valid = jnp.asarray(len(audio))
key = jax.random.PRNGKey(0)


def run(k, wire):
    out, _n48, _stats = sr._generate_jit(
        sr.params, sr.melvoco.vocoder_params, audio_dev, n_valid, k,
        in_sr, 48000, 1, sr.cfm_method, sr.ode_method, 1.0, 1.0)
    return _wire_int16(out) if wire == "int16" else out


def sustained(wire):
    q = queue.Queue(maxsize=8)
    done, errs = [], []

    def fetcher():
        while True:
            o = q.get()
            if o is None:
                return
            try:
                done.append(np.asarray(o))
            except Exception as e:  # keep draining; surface after join
                errs.append(e)

    th = threading.Thread(target=fetcher, daemon=True)
    _ = float(run(key, wire).ravel()[0])  # warm/drain before timing
    th.start()
    t0 = time.perf_counter()
    for i in range(n_clips):
        q.put(run(jax.random.fold_in(key, 100 + i), wire))
    q.put(None)
    th.join()
    wall = time.perf_counter() - t0
    if errs:
        raise errs[0]
    assert len(done) == n_clips
    return n_clips * seconds / wall


# compile both arms before any timing
for w in ("float32", "int16"):
    _ = float(run(key, w).ravel()[0])

res = {"float32": [], "int16": []}
for r in range(rounds):
    for w in ("float32", "int16"):  # interleaved
        res[w].append(round(sustained(w), 2))
        print(json.dumps({"round": r, "wire": w, "rtf": res[w][-1]}), flush=True)

print(json.dumps({
    "metric": "serving_wire_ab",
    "float32_median": sorted(res["float32"])[rounds // 2],
    "int16_median": sorted(res["int16"])[rounds // 2],
    "all": res,
}))
