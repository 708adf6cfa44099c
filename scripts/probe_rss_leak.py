#!/usr/bin/env python
"""Attribute the serving-soak RSS growth (scripts/soak_serving.py --diag):
drive the SAME cached generate program in a bare loop — no ServingPipeline,
no threads, no futures — and measure RSS growth per clip for (a) a
scalar-only fetch (no bulk download), (b) full float32 downloads, (c) int16
downloads. If growth tracks downloaded bytes even here, the retention is in
the PJRT/axon client's host-transfer path, not in this library's serving
plumbing (jax.live_arrays() stays flat and gc.collect() reclaims nothing
either way — measured in the soak diag).
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flowhigh_tpu import FlowHighConfig, FlowHighSR
from flowhigh_tpu.sr import _wire_int16


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 1e6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sr = FlowHighSR(FlowHighConfig(), cfm_method="independent_cfm_adaptive",
                    ode_method="euler", fused_vocoder=True)
    sr.init_params(jax.random.PRNGKey(0), fast=True)

    in_sr, seconds = 16000, 10.0
    rng = np.random.default_rng(0)
    t = np.arange(int(in_sr * seconds)) / in_sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
    audio_dev = jnp.asarray(audio)[None, :]
    n_valid = jnp.asarray(len(audio))
    key = jax.random.PRNGKey(0)

    def gen(k):
        out, n48, _ = sr._generate_jit(
            sr.params, sr.melvoco.vocoder_params, audio_dev, n_valid, k,
            in_sr, 48000, 1, sr.cfm_method, sr.ode_method, 1.0, 1.0)
        return out

    _ = float(gen(key).ravel()[0])  # warm/compile

    # the serving upload path: fresh host array + device_put per request
    # (ServingPipeline._upload), int16 input-wire program + int16 download
    audio_i16 = (audio * 32000).astype(np.int16)

    def gen_i16(arr_d, n_d, k):
        out, n48, _ = sr._generate_jit_i16(
            sr.params, sr.melvoco.vocoder_params, arr_d, n_d, k,
            in_sr, 48000, 1, sr.cfm_method, sr.ode_method, 1.0, 1.0)
        return out

    pad = np.zeros(len(audio_i16), np.int16)
    pad[:] = audio_i16
    a0, n0 = jax.device_put((pad[None, :], np.asarray(len(audio_i16))))
    _ = float(gen_i16(a0, n0, key).ravel()[0])  # warm/compile

    def upload_iter(i):
        padded = np.zeros(len(audio_i16), np.int16)
        padded[:] = audio_i16
        arr_d, n_d = jax.device_put(
            (padded[None, :], np.asarray(len(audio_i16))))
        out = gen_i16(arr_d, n_d, jax.random.fold_in(key, i))
        _ = np.asarray(_wire_int16(out))

    results = {}
    for arm in ("scalar_fetch", "float32_download", "int16_download",
                "upload_per_clip_i16_duplex"):
        r0 = rss_mb()
        for i in range(n):
            if arm == "upload_per_clip_i16_duplex":
                upload_iter(i)
                continue
            out = gen(jax.random.fold_in(key, i))
            if arm == "scalar_fetch":
                _ = float(out.ravel()[0])
            elif arm == "float32_download":
                _ = np.asarray(out)
            else:
                _ = np.asarray(_wire_int16(out))
        results[arm] = round((rss_mb() - r0) / n * 1024, 1)  # KiB/clip
    print(json.dumps({"metric": "rss_growth_kib_per_clip", "n": n,
                      **results}))


if __name__ == "__main__":
    main()
