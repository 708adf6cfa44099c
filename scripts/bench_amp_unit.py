"""Round-3 TPU measurement batch: unit-kernel microbench + verify drive.

Run AFTER the tunnel recovers; bench.py runs separately.
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


def timeit(fn, *args, reps=5, chain=12):
    @jax.jit
    def chained(x, *rest):
        acc = 0.0
        cur = x
        for i in range(chain):
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

# unit kernel vs two fused pairs, hot stage shapes
CASES = [
    ("s5 k7 d3", 60000, 48, 8, 7, 3),
    ("s5 k11 d5", 60000, 48, 8, 11, 5),
    ("s4 k7 d3", 60000, 96, 4, 7, 3),
    ("s3 k7 d3", 40000, 192, 2, 7, 3),
    ("s2 k7 d3", 20000, 384, 1, 7, 3),
]
chain = 8
sub = rtt / chain
for name, S, C, p, k, d in CASES:
    pc = p * C
    x = jnp.asarray(rng.standard_normal((1, S, pc)).astype(np.float32) * 0.3)
    a1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    a2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    pad1, pad2 = (k * d - d) // 2, (k - 1) // 2
    cap_u = PK.amp_unit_plan(k, d, p, C)
    cap_p = PK.act_conv_plan(k, pad1, d, p, C)

    def pairs(u):
        t1 = PK.pallas_packed_act_conv1d(u, a1, be1, True, w1, b1, pad=pad1,
                                         dilation=d, p=p, s_t_cap=cap_p or 256)
        return PK.pallas_packed_act_conv1d(
            t1, a2, be2, True, w2, b2, pad=pad2, dilation=1, p=p,
            residual=u, s_t_cap=256)

    tp = timeit(pairs, x, chain=chain) - sub
    print(f"{name}: pairs {tp:.3f} ms (cap_p={cap_p})", flush=True)
    if cap_u:
        for cap in (cap_u, 256 if cap_u != 256 else 128, 512):
            def unit(u, _c=cap):
                return PK.pallas_packed_amp_unit(
                    u, a1, be1, a2, be2, True, w1, b1, w2, b2, pad1=pad1,
                    dil1=d, pad2=pad2, p=p, s_t_cap=_c)
            try:
                tu = timeit(unit, x, chain=chain) - sub
                print(f"  unit cap={cap}: {tu:.3f} ms ({tp - tu:+.3f})",
                      flush=True)
            except Exception as e:
                print(f"  unit cap={cap}: FAIL {str(e)[:140]}", flush=True)
    else:
        print("  unit: not eligible", flush=True)

# newly eligible heavy pairs: fused vs unfused
HEAVY = [
    ("s1 k3 d1", 5000, 768, 1, 3, 1),
    ("s2 k11 d5", 20000, 384, 1, 11, 5),
    ("s3 k11 d5", 40000, 192, 2, 11, 5),
]
for name, S, C, p, k, d in HEAVY:
    pc = p * C
    pad = (k * d - d) // 2
    x = jnp.asarray(rng.standard_normal((1, S, pc)).astype(np.float32) * 0.3)
    a1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    cap = PK.act_conv_plan(k, pad, d, p, C)

    def unfused(u):
        aa = PK.packed_snake_activation1d(u, a1, be1, True, p)
        return PK.pallas_packed_conv1d(aa, w, b, pad=pad, dilation=d, p=p)

    tu_ = timeit(unfused, x, chain=chain) - sub
    line = f"{name}: unfused {tu_:.3f} ms"
    if cap:
        def fused(u, _c=cap):
            return PK.pallas_packed_act_conv1d(
                x, a1, be1, True, w, b, pad=pad, dilation=d, p=p, s_t_cap=_c)
        try:
            tf = timeit(fused, x, chain=chain) - sub
            line += f"  fused cap={cap}: {tf:.3f} ms ({tu_ - tf:+.3f})"
        except Exception as e:
            line += f"  fused FAIL {str(e)[:120]}"
    print(line, flush=True)

print("BATCH DONE", flush=True)
