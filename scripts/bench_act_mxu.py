"""Round-4 decision microbench: can the packed snake-act's FIR shifts move
onto the MXU? (VERDICT r3 next-round #1.)

Per hot stage shape, measures:
  act_full    — the shipping packed_snake_activation1d kernel
  firs_only   — same kernel with the snake monkeypatched to identity
                (isolates the FIR-shift/roll VPU cost)
  snake_floor — a trivial Pallas kernel doing the snake on 2x the elements
                (the irreducible VPU floor of the anti-aliased act)
  mxu_fir     — probe kernel with the proposed structure: up-FIR as 3 MXU
                dots [s,pc]@[pc,2pc], snake on [s,2pc], down-FIR as 3 dots
                [s,2pc]@[2pc,pc] (f32 and bf16 tap variants)
  conv_ref    — the shipping k7d3 packed conv (MXU rate calibration)

Timing: DIFFERENTIAL chains — per-op = (wall(chain=C_HI) - wall(chain=C_LO))
/ (C_HI - C_LO), each with a per-iteration value fetch. The tunnel RTT
cancels exactly, unlike the single-ended RTT-subtracted method, which went
negative when the morning RTT drifted between the null measurement and the
case runs (2026-08-19: null 41.9 ms vs ~34 ms during cases).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from _timing import C_HI, C_LO, timeit_diff  # differential-chain per-op timing

rng = np.random.default_rng(0)


import flowhigh_tpu.ops.packed as PK


# --- probe kernels ------------------------------------------------------------

def snake_only(x, ab):
    """Snake on 2x the elements of x (the act's nonlinear floor)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bsz, s, pc = x.shape
    s_t = PK._pick_rows(s, cap=512)

    def kernel(cur_ref, ab_ref, out_ref):
        u = cur_ref[0].astype(jnp.float32)
        a, b = ab_ref[0, :], ab_ref[1, :]
        y1 = PK._snake_packed(u, a, b)
        y2 = PK._snake_packed(u + 1.0, a, b)  # second pass = the 2x rate
        out_ref[0, :, :] = (y1 + y2).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(bsz, s // s_t),
        in_specs=[pl.BlockSpec((1, s_t, pc), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, pc), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, s_t, pc), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(x, ab)


def mxu_fir(x, up, dn, ab2, *, s_t_cap=256, do_snake=True):
    """Proposed structure: 3 up dots -> snake([s,2pc]) -> 3 down dots.
    Halos via neighbor blocks exactly like the shipping kernels."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bsz, s, pc = x.shape
    s_t = PK._pick_rows(s, cap=s_t_cap)
    n_tiles = s // s_t
    H = 8
    r_h = s_t // H
    dt = up.dtype

    def kernel(cur_ref, prev_ref, nxt_ref, up_ref, dn_ref, ab_ref, out_ref):
        ext = jnp.concatenate(
            [prev_ref[0], cur_ref[0], nxt_ref[0]], axis=0).astype(dt)
        # ext rows cover abs [-8, s_t+8) (local = abs+8). s2 covers abs
        # [-4, s_t+4): enough for the down dots' q in {-1,0,1} over out
        # rows [0, s_t), and its up-dot reads stay inside ext.
        n2 = s_t + 8
        s2 = jnp.zeros((n2, 2 * pc), jnp.float32)
        for qi, q in enumerate((-1, 0, 1)):
            s2 = s2 + jax.lax.dot_general(
                ext[4 + q:4 + q + n2, :], up_ref[qi],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if do_snake:
            # ab_ref is pre-tiled to 2pc lanes (Mosaic cannot lane-concat)
            s2 = PK._snake_packed(s2, ab_ref[0, :], ab_ref[1, :])
        s2 = s2.astype(dt)
        acc = jnp.zeros((s_t, pc), jnp.float32)
        for qi, q in enumerate((-1, 0, 1)):
            acc = acc + jax.lax.dot_general(
                s2[4 + q:4 + q + s_t, :], dn_ref[qi],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0, :, :] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, s_t, pc), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, pc),
                         lambda b, i: (b, jnp.maximum(i * r_h - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, pc),
                         lambda b, i: (b, jnp.minimum((i + 1) * r_h,
                                                      s // H - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pc, 2 * pc), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2 * pc, pc), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * pc), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_t, pc), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(x, x, x, up, dn, ab2)


CASES = [
    ("s5 p=8 c=48", 60000, 48, 8),
    ("s4 p=4 c=96", 60000, 96, 4),
    ("s3 p=2 c=192", 40000, 192, 2),
    ("s2 p=1 c=384", 20000, 384, 1),
]

orig_snake = PK._snake_packed
for name, S, C, p in CASES:
    pc = p * C
    x = jnp.asarray(rng.standard_normal((1, S, pc)).astype(np.float32) * 0.3)
    al = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    be = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    ab = jnp.stack([jnp.tile(jnp.exp(al), p),
                    jnp.tile(jnp.exp(be), p)]).astype(jnp.float32)
    ab2 = jnp.concatenate([ab, ab], axis=1)

    t_full = timeit_diff(
        lambda u: PK.packed_snake_activation1d(u, al, be, True, p), x)
    PK._snake_packed = lambda u, a, b: u  # FIRs only
    t_nosnake = timeit_diff(
        lambda u: PK.packed_snake_activation1d(u, al, be, True, p), x)
    PK._snake_packed = orig_snake
    t_snake = timeit_diff(snake_only, x, ab)
    print(f"{name}: act_full {t_full:.3f}  firs_only {t_nosnake:.3f}  "
          f"snake_floor {t_snake:.3f} ms", flush=True)

    # conv calibration at this stage shape (k7 d3)
    w = jnp.asarray(rng.standard_normal((7, C, C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.02)
    t_c = timeit_diff(lambda u: PK.pallas_packed_conv1d(
        u, w, b, pad=9, dilation=3, p=p), x)
    nq = len(PK._nonzero_taps(7, 9, 3, p)[0])
    gmacs = S * nq * pc * pc / 1e9
    print(f"  conv k7d3: {t_c:.3f} ms  ({nq} taps, {gmacs:.1f} GMAC -> "
          f"{gmacs / max(t_c, 1e-9) / 1e3:.0f} TMAC/s)", flush=True)

    if p == 1:
        continue  # shifts are free row slices at p=1; MXU-FIR is moot

    upM = jnp.asarray(rng.standard_normal((3, pc, 2 * pc)).astype(np.float32))
    dnM = jnp.asarray(rng.standard_normal((3, 2 * pc, pc)).astype(np.float32))
    variants = [("f32 cap256", upM, dnM, 256, True),
                ("f32 cap256 dots_only", upM, dnM, 256, False),
                ("f32 cap512", upM, dnM, 512, True),
                ("bf16 cap256", upM.astype(jnp.bfloat16),
                 dnM.astype(jnp.bfloat16), 256, True),
                ("bf16 cap512", upM.astype(jnp.bfloat16),
                 dnM.astype(jnp.bfloat16), 512, True)]
    for lbl, u_, d_, cap, snk in variants:
        try:
            t_m = timeit_diff(
                lambda u, a_, b_: mxu_fir(u, a_, b_, ab2, s_t_cap=cap,
                                          do_snake=snk), x, u_, d_)
            print(f"  mxu_fir {lbl}: {t_m:.3f} ms ({t_full - t_m:+.3f} vs act)",
                  flush=True)
        except Exception as e:
            print(f"  mxu_fir {lbl}: FAIL {str(e)[:140]}", flush=True)

print("BATCH DONE", flush=True)
