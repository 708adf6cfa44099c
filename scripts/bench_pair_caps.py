"""Pair-kernel time-tile cap sweep (round 3 follow-up).

The AMP-unit sweep showed bigger tiles always won for the unit kernel
(128 < 256 < 512). This sweeps the same caps for the fused act->conv PAIR
kernel at the shapes that still run as pairs after the unit retune
(s2 k11, s3 k7/k11 d>1, s4 k11 d5, and the always-pair second convs).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def timeit(fn, *args, reps=5, chain=8):
    @jax.jit
    def chained(x, *rest):
        acc = 0.0
        cur = x
        for _ in range(chain):
            y = fn(cur, *rest)
            acc = acc + y.ravel()[0]
            cur = x + 1e-12 * acc
        return acc
    _ = float(chained(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1000 / chain


@jax.jit
def _null(x):
    return x + 1.0


x0 = jnp.zeros((8, 128))
_ = float(_null(x0).ravel()[0])
ts = []
for _ in range(7):
    t0 = time.perf_counter()
    _ = float(_null(x0).ravel()[0])
    ts.append(time.perf_counter() - t0)
rtt = np.median(ts) * 1000
print(f"null rtt {rtt:.1f} ms", flush=True)

import flowhigh_tpu.ops.packed as PK

# (name, S, C, p, k, d) — shapes that remain PAIRS after the unit retune
CASES = [
    ("s2 k11 d5", 20000, 384, 1, 11, 5),
    ("s2 k11 d1", 20000, 384, 1, 11, 1),
    ("s3 k7 d3", 40000, 192, 2, 7, 3),
    ("s3 k7 d1(2nd)", 40000, 192, 2, 7, 1),
    ("s3 k11 d5", 40000, 192, 2, 11, 5),
    ("s3 k3 d3", 40000, 192, 2, 3, 3),
    ("s4 k11 d5", 60000, 96, 4, 11, 5),
]
chain = 8
sub = rtt / chain
for name, S, C, p, k, d in CASES:
    pc = p * C
    pad = (k * d - d) // 2
    x = jnp.asarray(rng.standard_normal((1, S, pc)).astype(np.float32) * 0.3)
    a1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    cap0 = PK.act_conv_plan(k, pad, d, p, C)
    line = f"{name}: plan={cap0}"
    for cap in (128, 256, 512):
        def fused(u, _c=cap):
            return PK.pallas_packed_act_conv1d(
                u, a1, be1, True, w, b, pad=pad, dilation=d, p=p, s_t_cap=_c)
        try:
            tf = timeit(fused, x, chain=chain) - sub
            line += f"  cap{cap}={tf:.3f}ms"
        except Exception as e:
            line += f"  cap{cap}=FAIL({str(e)[:60]})"
    print(line, flush=True)

print("PAIR SWEEP DONE", flush=True)
