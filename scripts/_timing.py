"""Shared differential-chain timing for the per-op TPU microbenches.

Per-op = (wall(chain=C_HI) - wall(chain=C_LO)) / (C_HI - C_LO), each wall
taken with a per-iteration value fetch. The tunnel control RTT appears in
BOTH walls and cancels exactly — PERF.md round-4: the single-ended
"subtract a null-program RTT" method went NEGATIVE when the RTT drifted
between the null measurement and the cases. This methodology is
load-bearing (PERF.md cites it for every per-op number since round 4):
edit HERE, never in per-script copies.

Importing this module also points jax at the persistent compile cache.
"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

C_HI, C_LO = 32, 8


def timeit_diff(fn, *args, reps=5):
    """Median per-op milliseconds of ``fn(*args)`` by differential chains."""
    def make(chain):
        @jax.jit
        def chained(x, *rest):
            acc = 0.0
            cur = x
            for i in range(chain):
                y = fn(cur, *rest)
                acc = acc + y.ravel()[0]
                cur = x + 1e-12 * acc
            return acc
        return chained
    hi, lo = make(C_HI), make(C_LO)
    _ = float(hi(*args))
    _ = float(lo(*args))
    th, tl = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(hi(*args))
        th.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(lo(*args))
        tl.append(time.perf_counter() - t0)
    return (np.median(th) - np.median(tl)) * 1000 / (C_HI - C_LO)
