"""Trace the full generate program on TPU and print per-op device totals.

Parses the perfetto trace.json.gz (chrome trace events) — no TF needed.
"""
import glob
import gzip
import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from flowhigh_tpu import FlowHighConfig, FlowHighSR

seconds, in_sr = 10.0, 16000
# argv[1]: fuse_act_conv mode — "true" (units+pairs, the serving default),
# "pairs" (pair fusion only, the A/B knob), "false" (no fusion)
_mode = (sys.argv[1] if len(sys.argv) > 1 else "true").lower()
fuse = {"true": True, "pairs": "pairs", "false": False}[_mode]
sr = FlowHighSR(FlowHighConfig(), cfm_method="independent_cfm_adaptive",
                ode_method="euler", fused_vocoder=True, fuse_act_conv=fuse)
sr.init_params(jax.random.PRNGKey(0), fast=True)
rng = np.random.default_rng(0)
t = np.arange(int(in_sr * seconds)) / in_sr
audio = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
audio_dev = jnp.asarray(audio)[None, :]
n_valid = jnp.asarray(len(audio))
key = jax.random.PRNGKey(0)


def run(k):
    out, n48, _ = sr._generate_jit(
        sr.params, sr.melvoco.vocoder_params, audio_dev, n_valid, k,
        in_sr, 48000, 1, sr.cfm_method, sr.ode_method, 1.0, 1.0)
    return out


_ = float(run(key).ravel()[0])
t0 = time.perf_counter()
_ = float(run(key).ravel()[0])
print(f"warm wall: {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

logdir = "/tmp/e2e_trace"
import shutil

shutil.rmtree(logdir, ignore_errors=True)
jax.profiler.start_trace(logdir)
for i in range(2):
    _ = float(run(jax.random.fold_in(key, i)).ravel()[0])
jax.profiler.stop_trace()

files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
print(files)
ev = []
for f in files:
    with gzip.open(f, "rt") as fh:
        ev.extend(json.load(fh).get("traceEvents", []))

# device-side complete events: pid/tid naming varies; filter by known TPU
# device thread names via process metadata
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "tpu" in n}
tot = {}
cnt = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        n = e.get("name", "?")
        tot[n] = tot.get(n, 0.0) + e.get("dur", 0) / 1e3
        cnt[n] = cnt.get(n, 0) + 1
print(f"total device (2 iters): {sum(tot.values()):.1f} ms over {sum(cnt.values())} events")
for n, v in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{v / 2:8.2f} ms  x{cnt[n] // 2:<4d} {n[:110]}")

# dump per-op ms (per clip) for plan A/B diffing
out_path = f"/tmp/trace_ops_{_mode}.json"
with open(out_path, "w") as fh:
    json.dump({n: v / 2 for n, v in tot.items()}, fh)
print("wrote", out_path)
