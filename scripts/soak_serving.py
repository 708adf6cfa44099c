#!/usr/bin/env python
"""Sustained-serving soak on the real TPU: ServingPipeline driven
continuously for N minutes (default 20), int16 duplex wire (the production
config for 16-bit sources), bounded in-flight.

Answers the production questions the per-run benches can't: does
throughput DRIFT over tens of minutes (compile-cache churn, host queue
growth, tunnel degradation), does host memory grow (future/buffer leaks
in the StagePipeline plumbing), and how often does the tunnel stall
(>5 s per-clip wall gaps — CLAUDE.md records multi-minute stalls).

Prints one JSON line: per-minute RTF buckets (min/median/max), RSS at
start/end, stall count. A clean soak = flat buckets + flat RSS.

Reference analog: none — the reference serves one blocking clip at a time
(example.py:1-13); sustained serving is new capability (SURVEY §5).
"""
import argparse
import json
import pathlib
import sys
import time
from collections import deque

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np

cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flowhigh_tpu import FlowHighConfig, FlowHighSR, ServingPipeline


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 1e6  # resident pages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--seconds", type=float, default=10.0, help="clip length")
    ap.add_argument("--in_sr", type=int, default=16000)
    ap.add_argument("--stall_s", type=float, default=5.0,
                    help="per-result wall gap counted as a tunnel stall")
    ap.add_argument("--diag", action="store_true",
                    help="end-of-run memory diagnosis: jax live arrays, "
                         "RSS after gc.collect() and after malloc_trim(0) "
                         "— separates a true reference leak from allocator "
                         "retention")
    args = ap.parse_args()

    sr = FlowHighSR(FlowHighConfig(), cfm_method="independent_cfm_adaptive",
                    ode_method="euler", fused_vocoder=True)
    sr.init_params(jax.random.PRNGKey(0), fast=True)

    rng = np.random.default_rng(0)
    t = np.arange(int(args.in_sr * args.seconds)) / args.in_sr
    base = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 880 * t))
    clips = [((base + 0.01 * rng.standard_normal(t.shape)) * 32000)
             .astype(np.int16) for _ in range(8)]

    out_s_per_clip = args.seconds  # same duration at 48 kHz
    minute_out_s = []              # completed output seconds per minute bucket
    stalls, done, rss0 = 0, 0, rss_mb()

    with ServingPipeline(sr, max_in_flight=8, wire="int16") as srv:
        srv.warmup(args.in_sr, args.seconds, dtype=np.int16)
        t0 = time.perf_counter()
        end = t0 + args.minutes * 60
        pending = deque()
        i = 0
        last = t0
        while True:
            now = time.perf_counter()
            if now < end:
                while len(pending) < 16:
                    pending.append(srv.submit(clips[i % len(clips)],
                                              args.in_sr))
                    i += 1
            elif not pending:
                break
            out = pending.popleft().result()
            # int16 wire converts back to float32 host-side (serving.py:205)
            assert out.dtype == np.float32 and out.size > 0
            now = time.perf_counter()
            if now - last > args.stall_s:
                stalls += 1
            last = now
            done += 1
            bucket = int((now - t0) // 60)
            while len(minute_out_s) <= bucket:
                minute_out_s.append(0.0)
            minute_out_s[bucket] += out_s_per_clip

    wall = time.perf_counter() - t0
    # live minutes carry the drift stats; tunnel-stall dead minutes (zero
    # completions — the axon tunnel has measured multi-minute outages) are
    # counted separately so one outage doesn't poison the drift read
    full = [m for m in minute_out_s[:-1] if m > 0] or minute_out_s
    dead = sum(1 for m in minute_out_s[:-1] if m == 0)
    rtf = [round(m / 60.0, 1) for m in full]
    out = {
        "metric": f"serving_soak_{args.minutes:g}min_int16_duplex",
        "clips": done,
        "wall_s": round(wall, 1),
        "rtf_overall": round(done * out_s_per_clip / wall, 1),
        "rtf_per_min_min": min(rtf), "rtf_per_min_median":
            sorted(rtf)[len(rtf) // 2], "rtf_per_min_max": max(rtf),
        "stalls_gt_5s": stalls, "dead_minutes": dead,
        "rss_mb_start": round(rss0, 1), "rss_mb_end": round(rss_mb(), 1),
    }
    if args.diag:
        import ctypes
        import gc
        live = jax.live_arrays()
        out["live_arrays"] = len(live)
        out["live_mb"] = round(sum(a.nbytes for a in live) / 1e6, 1)
        gc.collect()
        out["rss_mb_post_gc"] = round(rss_mb(), 1)
        ctypes.CDLL("libc.so.6").malloc_trim(0)
        out["rss_mb_post_trim"] = round(rss_mb(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
