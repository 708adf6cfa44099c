#!/usr/bin/env python
"""Capture an xplane trace of one vocoder forward and print per-op totals."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import glob
    import jax
    import jax.numpy as jnp
    import numpy as np

    mode = sys.argv[1] if len(sys.argv) > 1 else "packed"
    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowhigh_tpu.config import VocoderConfig
    from flowhigh_tpu.models.bigvgan import BigVGAN

    cfg = VocoderConfig()
    kw = dict(
        fused=dict(fused_act=True),
        packed=dict(fused_act=True, packed=True),
        packed_bf16=dict(fused_act=True, packed=True, conv_dtype=jnp.bfloat16),
    )[mode]
    model = BigVGAN(cfg, **kw)
    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, cfg.num_mels)))
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(s.dtype) * 0.05),
        shapes)
    mel = jnp.asarray(rng.standard_normal((1, 1000, cfg.num_mels)).astype(np.float32))
    fn = jax.jit(model.apply)
    _ = float(fn(params, mel).ravel()[0])  # warm

    logdir = "/tmp/voc_trace"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    for _ in range(2):
        _ = float(fn(params, mel).ravel()[0])
    jax.profiler.stop_trace()

    # parse the xplane protobuf
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
    print("parsed via tf")


if __name__ == "__main__":
    main()
