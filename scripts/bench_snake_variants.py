"""Round-4 probe: cheaper snake arithmetic inside the packed act kernel.

The round-4 isolation (bench_act_mxu.py) showed the snake polynomial is
~65% of the packed act's cost and runs at ~80% of the VPU's instruction-
issue roofline — so the remaining levers are (a) fewer instructions
(fold 2*alpha and 1/(2*pi) into ONE per-lane constant) and (b) bf16
arithmetic, IF Mosaic packs bf16 ALU ops two-per-lane on v5e.

Variants, timed as the full standalone act kernel via monkeypatching
PK._snake_packed (differential-chain timing, RTT cancels):
  base      — shipping _snake_packed (fast_cos, 2*alpha mul inside)
  folded    — alpha pre-scaled: ONE mul by c1 = alpha/pi, saves 1 op
  bf16      — polynomial evaluated in bf16 (cast in/out), probing 2x packing
  poly5     — 5-term cos polynomial (err ~1e-4) — accuracy floor probe
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from _timing import C_HI, C_LO, timeit_diff  # differential-chain per-op timing

rng = np.random.default_rng(0)


import flowhigh_tpu.ops.packed as PK
from flowhigh_tpu.ops.fused_act import _COS_COEFFS

INV_PI = float(1.0 / np.pi)


def snake_folded(u, alpha, beta):
    """One range-reduction mul: t = u * (alpha/pi) (folds 2a and 1/2pi)."""
    half_inv_b = 0.5 / (beta + 1e-9)
    t = u * (alpha * INV_PI)
    r = t - jnp.round(t)
    r2 = r * r
    acc = jnp.full_like(u, _COS_COEFFS[-1])
    for coef in _COS_COEFFS[-2::-1]:
        acc = acc * r2 + coef
    return (u + half_inv_b) - half_inv_b * acc


def snake_bf16(u, alpha, beta):
    """Polynomial in bf16 (inputs/outputs f32) — probes 2-per-lane packing."""
    half_inv_b = 0.5 / (beta + 1e-9)
    t = (u * (alpha * INV_PI)).astype(jnp.bfloat16)
    r = t - jnp.round(t)
    r2 = r * r
    acc = jnp.full_like(r, jnp.bfloat16(_COS_COEFFS[-1]))
    for coef in _COS_COEFFS[-2::-1]:
        acc = acc * r2 + jnp.bfloat16(coef)
    return (u + half_inv_b) - half_inv_b * acc.astype(jnp.float32)


_P5 = _COS_COEFFS[:5]


def snake_poly5(u, alpha, beta):
    half_inv_b = 0.5 / (beta + 1e-9)
    t = u * (alpha * INV_PI)
    r = t - jnp.round(t)
    r2 = r * r
    acc = jnp.full_like(u, _P5[-1])
    for coef in _P5[-2::-1]:
        acc = acc * r2 + coef
    return (u + half_inv_b) - half_inv_b * acc


CASES = [
    ("s5 p=8 c=48", 60000, 48, 8),
    ("s4 p=4 c=96", 60000, 96, 4),
    ("s3 p=2 c=192", 40000, 192, 2),
    ("s2 p=1 c=384", 20000, 384, 1),
    ("s1 p=1 c=768", 5000, 768, 1),
]

VARIANTS = [("base", PK._snake_packed), ("folded", snake_folded),
            ("bf16", snake_bf16), ("poly5", snake_poly5)]

orig = PK._snake_packed
for name, S, C, p in CASES:
    pc = p * C
    x = jnp.asarray(rng.standard_normal((1, S, pc)).astype(np.float32) * 0.3)
    al = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    line = f"{name}:"
    for lbl, fn in VARIANTS:
        PK._snake_packed = fn
        try:
            t = timeit_diff(
                lambda u: PK.packed_snake_activation1d(u, al, be, True, p), x)
            line += f"  {lbl} {t:.3f}"
        except Exception as e:
            line += f"  {lbl} FAIL({str(e)[:60]})"
        finally:
            PK._snake_packed = orig
    print(line + " ms", flush=True)

# numeric deltas of the variants vs base (CPU-exact f64 reference not
# needed — the parity bar is the kernel-tolerance 2e-5)
u = jnp.asarray(rng.standard_normal((4096,)).astype(np.float32) * 8.0)
a = jnp.asarray(np.abs(rng.standard_normal((4096,))).astype(np.float32) + 0.1)
b = a
for lbl, fn in VARIANTS[1:]:
    d = float(jnp.abs(fn(u, a, b) - orig(u, a, b)).max())
    print(f"numdiff {lbl}: {d:.2e}", flush=True)

print("BATCH DONE", flush=True)
