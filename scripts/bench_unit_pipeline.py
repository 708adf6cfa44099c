"""Round-4 experiment: subtile software pipelining inside the fused AMP-unit
kernel (pipeline=N splits interior tiles into N row subtiles and interleaves
act/conv emission so VPU snake work and MXU conv dots can dual-issue).

Motivation: the MFU table (PERF.md round-4) shows stages 2-4 at ~30% of BOTH
the MXU and VPU peaks — the monolithic act1->conv1->act2->conv2 chain
serializes the engines. If Mosaic's scheduler overlaps the independent
subtile work, per-unit time should approach max(VPU, MXU) instead of the sum.

Timing: differential chains (see scripts/bench_act_mxu.py).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from _timing import C_HI, C_LO, timeit_diff  # differential-chain per-op timing

import flowhigh_tpu.ops.packed as PK

rng = np.random.default_rng(0)


# (label, packed rows S, C, p, k, dilation) — the post-retune shipping units
CASES = [
    ("s5 k7d3  p=8 c=48", 60000, 48, 8, 7, 3),
    ("s5 k3d1  p=8 c=48", 60000, 48, 8, 3, 1),
    ("s4 k7d5  p=4 c=96", 60000, 96, 4, 7, 5),
    ("s4 k11d1 p=4 c=96", 60000, 96, 4, 11, 1),
    ("s3 k3d1  p=2 c=192", 40000, 192, 2, 3, 1),
]

for name, S, C, p, k, d in CASES:
    pc = p * C
    x = jnp.asarray(rng.standard_normal((1, S, pc)).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    a1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    a2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    pad1, pad2 = (k * d - d) // 2, (k - 1) // 2

    ref = None
    for cap in (512, 256):
        for pipe in (1, 2, 4):
            try:
                t = timeit_diff(
                    lambda u: PK.pallas_packed_amp_unit(
                        u, a1, be1, a2, be2, True, w1, b1, w2, b2,
                        pad1=pad1, dil1=d, pad2=pad2, p=p,
                        s_t_cap=cap, pipeline=pipe), x)
                base = "" if ref is None else f" ({ref - t:+.3f} vs cap512/p1)"
                if ref is None:
                    ref = t
                print(f"{name} cap{cap} pipe{pipe}: {t:.3f} ms{base}",
                      flush=True)
            except Exception as e:
                print(f"{name} cap{cap} pipe{pipe}: FAIL {str(e)[:120]}",
                      flush=True)

# --- fused act->conv PAIR kernel, same experiment -----------------------------
PAIR_CASES = [
    ("s5 pair k11d3 p=8 c=48", 60000, 48, 8, 11, 3),
    ("s4 pair k11d5 p=4 c=96", 60000, 96, 4, 11, 5),
    ("s3 pair k11d3 p=2 c=192", 40000, 192, 2, 11, 3),
    ("s3 pair k7d5  p=2 c=192", 40000, 192, 2, 7, 5),
]

for name, S, C, p, k, d in PAIR_CASES:
    pc = p * C
    x = jnp.asarray(rng.standard_normal((1, S, pc)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    a1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    pad = (k * d - d) // 2

    ref = None
    for cap in (256, 128):
        for pipe in (1, 2, 4):
            try:
                t = timeit_diff(
                    lambda u: PK.pallas_packed_act_conv1d(
                        u, a1, be1, True, w, b, pad=pad, dilation=d, p=p,
                        s_t_cap=cap, pipeline=pipe), x)
                base = "" if ref is None else f" ({ref - t:+.3f} vs cap256/p1)"
                if ref is None:
                    ref = t
                print(f"{name} cap{cap} pipe{pipe}: {t:.3f} ms{base}",
                      flush=True)
            except Exception as e:
                print(f"{name} cap{cap} pipe{pipe}: FAIL {str(e)[:120]}",
                      flush=True)

print("BATCH DONE", flush=True)
