#!/usr/bin/env python
"""Vocoder-only RTF bench on the real TPU: plain fused vs packed vs packed+bf16.

Honest timing per CLAUDE.md: per-iteration scalar fetch, median of reps.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="packed",
                    choices=["fused", "packed", "packed_bf16", "pallas",
                             "pallas_f32"])
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowhigh_tpu.config import VocoderConfig
    from flowhigh_tpu.models.bigvgan import BigVGAN

    cfg = VocoderConfig()
    kw = dict(
        fused=dict(fused_act=True),
        packed=dict(fused_act=True, packed=True),
        packed_bf16=dict(fused_act=True, packed=True, conv_dtype=jnp.bfloat16),
        pallas=dict(fused_act=True, packed=True, pallas_convs=True),
        pallas_f32=dict(fused_act=True, packed=True, pallas_convs=True,
                        conv_dtype=jnp.float32),
    )[args.mode]
    model = BigVGAN(cfg, **kw)

    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, cfg.num_mels)))
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(s.dtype) * 0.05),
        shapes)
    mel = jnp.asarray(rng.standard_normal((1, args.frames, cfg.num_mels))
                      .astype(np.float32))

    fn = jax.jit(model.apply)
    t0 = time.perf_counter()
    y = fn(params, mel)
    v = float(y.ravel()[0])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s out={y.shape} "
          f"v={v:.5f} finite={bool(np.isfinite(np.asarray(y)).all())}")

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        _ = float(fn(params, mel).ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    dur = args.frames * 480 / 48000
    print(f"mode={args.mode} frames={args.frames}: median {dt*1e3:.1f} ms "
          f"({dur/dt:.1f}x realtime)  all={[round(t*1e3,1) for t in times]}")


if __name__ == "__main__":
    main()
