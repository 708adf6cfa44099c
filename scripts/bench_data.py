"""Host data-pipeline feed-rate bench (VERDICT r2 item 7).

Question: can the host-side degradation pipeline (cheby1 design +
sosfiltfilt + two resample_polys per 3 s clip, reference data.py:92-131)
feed the measured 528 clips/s device rate of the batch-32 train step?

Measures clips/s of `batch_iterator` at batch 128 over the synthetic 3 s
corpus for 1/2/4/8 worker threads and for raw sequential items, and reports
whether threads scale (scipy's filtering/resampling is C code that releases
the GIL) or process workers are required (the reference uses 8 worker
processes, data.py:169-171).

Run: python scripts/bench_data.py  (pure host work — no TPU involvement)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

from flowhigh_tpu.config import DataConfig  # noqa: E402
from flowhigh_tpu.train.data import SyntheticAudioDataset, batch_iterator  # noqa: E402

BATCH = 128
TARGET_CLIPS_S = 528.0  # device rate, PERF.md train-throughput section


def bench_sequential(ds, n_items=64):
    t0 = time.perf_counter()
    for i in range(n_items):
        ds[i % len(ds)]
    dt = time.perf_counter() - t0
    return n_items / dt


def bench_iterator(ds, num_workers, worker_type="thread", n_batches=16):
    """Steady-state clips/s: drain past the prefetch queue depth so the
    number isn't inflated by batches stockpiled during warm-up."""
    it = batch_iterator(ds, BATCH, num_workers=num_workers,
                        pad_to=48000 * 3, prefetch=2,
                        worker_type=worker_type)
    for _ in range(3):  # warm: workers up, queue filled once and drained
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    it.close()
    return n_batches * BATCH / dt


def main():
    import os
    cores = os.cpu_count() or 1
    ds = SyntheticAudioDataset(DataConfig(), n_items=256, seconds=3.0)
    seq = bench_sequential(ds)
    print(f"host cores: {cores}")
    print(f"sequential degradation: {seq:6.1f} clips/s "
          f"({1000/seq:.1f} ms/clip, incl. ~16 ms synthetic wave gen that a "
          f"real corpus replaces with a disk read)")

    # Degradation-only engine comparison (no wave gen): scipy vs native C++.
    from flowhigh_tpu import native
    from flowhigh_tpu.dsp.filters import host_degrade
    wave = np.random.default_rng(0).standard_normal(48000 * 3)
    cases = [(8000, 8, 0.05), (9000, 11, 5.0), (31000, 5, 1.0)]
    for engine in (["scipy", "native"] if native.available() else ["scipy"]):
        for r, o, rip in cases:
            host_degrade(wave, 48000, r, o, rip, engine=engine)  # warm cache
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            for r, o, rip in cases:
                host_degrade(wave, 48000, r, o, rip, engine=engine)
        ms = (time.perf_counter() - t0) / (reps * len(cases)) * 1e3
        print(f"degrade-only ({engine:6s}): {ms:5.2f} ms/clip (3 s @48k, "
              f"mean over rates {[c[0] for c in cases]})")
    results = {}
    for wt, w in [("thread", 8), ("process", 8)]:
        r = bench_iterator(ds, w, wt)
        results[(wt, w)] = r
        ok = "OK " if r >= TARGET_CLIPS_S else "SLOW"
        print(f"{wt}s={w}: {r:6.1f} clips/s  [{ok} vs device "
              f"{TARGET_CLIPS_S:.0f} clips/s]")
    best_kind, best = max(results.items(), key=lambda kv: kv[1])
    print(f"\nbest here: {best_kind[0]}s={best_kind[1]} at {best:.1f} "
          f"clips/s vs device {TARGET_CLIPS_S:.0f}")
    if cores <= 2:
        need = TARGET_CLIPS_S / seq
        print(f"NOTE: this image has {cores} core(s) — worker scaling cannot "
              f"be observed here; extrapolation: at {1000/seq:.1f} ms/clip, "
              f"~{need:.0f} busy cores sustain the device rate "
              f"(worker_type='process' with >= that many workers on a real "
              f"multi-core TPU-VM host).")


if __name__ == "__main__":
    main()
