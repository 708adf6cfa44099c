"""ServingPipeline throughput on the real TPU: f32 vs int16-download vs
full int16 duplex wire (int16 uploads AND downloads).

True serving measurement: unlike bench.py's sustained loop (input uploaded
once, reused), every request here pays its own host->device upload, async
dispatch, and device->host download — all overlapped by the pipeline's
threads. The duplex arm submits int16-dtype clips so the INPUT wire
(sr.py _generate_jit_i16: upload raw int16, cast+scale on device —
bit-identical, /32768 is a power of two) halves upload bytes too; it
answers whether uploads still bind once downloads are int16 (PERF.md
round-4 left this deferred "until uploads bind"). Arms are INTERLEAVED
(f32, i16, duplex, f32, ...) so tunnel-RTT weather hits all equally
(CLAUDE.md: RTT drifts +-30% within an hour).
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

cache = pathlib.Path("/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flowhigh_tpu import FlowHighConfig, FlowHighSR, ServingPipeline

seconds, in_sr, n_clips, rounds = 10.0, 16000, 12, 3

sr = FlowHighSR(FlowHighConfig(), cfm_method="independent_cfm_adaptive",
                ode_method="euler", fused_vocoder=True)
sr.init_params(jax.random.PRNGKey(0), fast=True)

rng = np.random.default_rng(0)
t = np.arange(int(in_sr * seconds)) / in_sr
base = (0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
clips = [(base + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
         for _ in range(n_clips)]
clips_i16 = [(c * 32767.0).astype(np.int16) for c in clips]

# arm -> (download wire, submitted clips)
ARMS = {
    "float32": ("float32", clips),
    "int16": ("int16", clips),
    "duplex": ("int16", clips_i16),
}


def run(arm):
    wire, cs = ARMS[arm]
    with ServingPipeline(sr, max_in_flight=8, wire=wire) as srv:
        srv.warmup(in_sr, seconds, dtype=cs[0].dtype.type)
        t0 = time.perf_counter()
        futs = [srv.submit(c, in_sr) for c in cs]
        outs = [f.result() for f in futs]
        wall = time.perf_counter() - t0
    assert all(np.isfinite(o).all() for o in outs)
    return n_clips * seconds / wall


for w in ARMS:  # compile every arm before timing
    _ = run(w)

res = {w: [] for w in ARMS}
for r in range(rounds):
    for w in ARMS:  # interleaved
        res[w].append(round(run(w), 2))
        print(json.dumps({"round": r, "arm": w, "rtf": res[w][-1]}), flush=True)

print(json.dumps({
    "metric": "serving_pipeline_rtf_10s_euler1",
    **{f"{w}_median": sorted(res[w])[rounds // 2] for w in ARMS},
    "all": res,
}))
