"""Command-line interface.

Covers the reference's user-facing script surface: the documented argparse
inference CLI (reference: README.md:69-78 — flags --time_step --ode_method
--cfm_method --sigma --architecture --n_layers --vocoder_path), the training
entry (reference: src/flowhigh/train/train.py:25-103) and the standalone
BigVGAN dir-of-wavs vocoder inference
(reference: src/flowhigh/models/bigvgan/inference.py:42-99).

Usage:
    python -m flowhigh_tpu.cli infer   --input in.wav --output out.wav ...
    python -m flowhigh_tpu.cli infer   --input_dir wavs/ --output_dir out/ ...
    python -m flowhigh_tpu.cli train   --config configs/config.json
    python -m flowhigh_tpu.cli vocoder --input_dir wavs/ --output_dir out/ ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _write_wav(path, sr, audio: np.ndarray):
    import scipy.io.wavfile as wavfile
    audio = np.clip(audio, -1.0, 1.0)
    wavfile.write(path, sr, (audio * 32767).astype(np.int16))


def cmd_infer(args) -> int:
    import jax

    from .sr import FlowHighSR
    from .streaming import StreamingSR
    from .train.data import load_wav_mono

    if bool(args.input_dir) == bool(args.input):
        print("[infer] give either --input/--output or --input_dir/--output_dir",
              file=sys.stderr)
        return 2
    if args.input_dir and not args.output_dir:
        print("[infer] --input_dir requires --output_dir", file=sys.stderr)
        return 2

    if args.ckpt_dir:
        model = FlowHighSR.from_local(
            args.ckpt_dir, model_file=args.model_file, cfm_method=args.cfm_method)
    else:
        print("[infer] no --ckpt_dir given: using random weights (smoke mode)")
        from .config import FlowHighConfig, ModelConfig, VocoderConfig
        cfg = FlowHighConfig()
        if args.tiny:
            cfg = cfg.replace(
                model=ModelConfig(dim_in=256, dim=64, depth=args.n_layers,
                                  heads=2, dim_head=16,
                                  architecture=args.architecture),
                vocoder=VocoderConfig(
                    num_mels=256, upsample_initial_channel=32,
                    upsample_rates=(8, 5, 4, 3), upsample_kernel_sizes=(16, 10, 8, 6),
                    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))
        model = FlowHighSR(cfg, cfm_method=args.cfm_method,
                           ode_method=args.ode_method, sigma=args.sigma)
        model.init_params(jax.random.PRNGKey(0), fast=not args.tiny)
    model.ode_method = args.ode_method
    model.sigma = args.sigma

    if args.input_dir:
        # dir-of-wavs batch serving through the pipelined API: uploads,
        # dispatch, and downloads of different clips overlap (the
        # reference's analog is the sequential bigvgan/inference.py:54-70
        # loop, one blocking clip at a time)
        from .serving import ServingPipeline

        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        wavs = sorted(Path(args.input_dir).glob("*.wav"))
        if not wavs:
            print(f"[infer] no .wav files in {args.input_dir}", file=sys.stderr)
            return 2
        from .sr import BUCKET_SAMPLES

        # keep_int16: mono 16-bit files upload raw int16 (half the bytes)
        # and cast+scale on device — bit-identical (sr.py _generate_jit_i16).
        # NOTE each distinct (rate, bucket, input dtype) compiles its own
        # program (minutes cold on a tunneled TPU): a directory mixing
        # mono-int16 and stereo/float wavs of the same length costs TWO
        # compiles per (rate, bucket). --no_int16_wire forces everything
        # onto the float32 programs.
        items = [(w, *load_wav_mono(w, keep_int16=not args.no_int16_wire))
                 for w in wavs]
        with ServingPipeline(model, wire=args.wire,
                             timestep=args.time_step) as srv:
            # pre-warm every needed (rate, bucket, dtype) program before
            # accepting traffic (ServingPipeline's documented contract)
            combos = set()
            for _, audio, sr_in in items:
                in_bucket = max(1, BUCKET_SAMPLES * sr_in // 48000)
                n_pad = max(in_bucket,
                            -(-len(audio) // in_bucket) * in_bucket)
                combos.add((sr_in, n_pad, np.dtype(audio.dtype)))
            for sr_in, n_pad, dt in sorted(
                    combos, key=lambda c: (c[0], c[1], c[2].name)):
                srv.warmup(sr_in, n_pad / sr_in, dtype=dt)
            futs = [(w, srv.submit(audio, sr_in))
                    for w, audio, sr_in in items]
            for w, f in futs:
                out = f.result()
                dest = out_dir / f"{w.stem}_48k.wav"
                _write_wav(dest, 48000, out[0])
                print(f"[infer] {w.name} -> {dest.name} "
                      f"({out.shape[-1] / 48000:.2f} s)")
        return 0

    # mono 16-bit wavs ride the int16 input wire (half the upload bytes,
    # bit-identical) through generate() and StreamingSR alike
    audio, sr = load_wav_mono(args.input,
                              keep_int16=not args.no_int16_wire)
    if args.longform == "single_pass":
        # full-context CFM (no chunk seams), vocoder chunked bit-exactly;
        # pair with ModelConfig(attn_flash=True) on TPU for O(N) attention
        if audio.dtype == np.int16:  # longform program is float-only
            audio = audio.astype(np.float32) / 32768.0
        out = model.generate_longform(audio, sr, timestep=args.time_step)
    elif args.streaming or args.longform == "streaming" or len(audio) > 30 * sr:
        out = StreamingSR(model).generate(audio, sr, timestep=args.time_step)
    else:
        out = model.generate(audio, sr, timestep=args.time_step)
    _write_wav(args.output, 48000, out[0])
    print(f"[infer] {args.input} ({sr} Hz) -> {args.output} (48000 Hz), "
          f"{out.shape[-1] / 48000:.2f} s")
    return 0


def cmd_train(args) -> int:
    import jax

    from .config import FlowHighConfig
    from .parallel import initialize, make_global_mesh, make_mesh
    from .train import (AudioDataset, SyntheticAudioDataset, Trainer,
                        batch_iterator, random_split)

    # multi-host entry: joins the jax coordination service when launched on a
    # pod / with JAX_COORDINATOR_ADDRESS etc. set; no-op single-process
    # (the reference's `accelerate launch` analog, ref trainer.py:97-102)
    proc_idx, proc_cnt = initialize()
    if proc_cnt > 1:
        print(f"[train] multi-host: process {proc_idx}/{proc_cnt}, "
              f"{len(jax.devices())} global devices")

    cfg = (FlowHighConfig.from_reference_json(args.config)
           if args.config else FlowHighConfig())
    if args.steps:
        cfg = cfg.replace(train=cfg.train.__class__(
            **{**cfg.train.__dict__, "num_train_steps": args.steps}))

    if cfg.data.data_path and Path(cfg.data.data_path).exists():
        ds = AudioDataset(cfg.data.data_path, cfg.data)
    else:
        print("[train] data_path missing: using synthetic corpus")
        ds = SyntheticAudioDataset(cfg.data, n_items=256, seconds=3.0)

    # train/valid split (reference: trainer.py:118-129, seed 53) unless a
    # dedicated valid corpus is configured (valid_prepare analog)
    if cfg.data.valid_path and Path(cfg.data.valid_path).exists():
        train_ds = ds
        valid_ds = AudioDataset(cfg.data.valid_path, cfg.data, mode="valid")
    else:
        train_ds, valid_ds = random_split(ds, cfg.train.valid_frac,
                                          cfg.train.random_split_seed)
        print(f"[train] {len(train_ds)} train / {len(valid_ds)} valid "
              f"(random_split seed {cfg.train.random_split_seed})")

    if proc_cnt > 1:
        mesh = make_global_mesh(n_model=args.tp)
    else:
        mesh = make_mesh(n_model=args.tp) if args.tp > 1 else make_mesh()
    trainer = Trainer(cfg, mesh=mesh, cfm_method=cfg.cfm.cfm_method,
                      results_folder=args.save_dir or cfg.train.save_dir)
    # model summary at startup (reference: train.py:75 torchinfo.summary);
    # eval_shape only — no init compile
    import jax.numpy as jnp

    from .utils import model_summary
    dummy = jnp.zeros((1, 8, cfg.mel.n_mels))
    shapes = jax.eval_shape(trainer.net.init, jax.random.PRNGKey(0), dummy,
                            times=jnp.zeros(()), cond=dummy)
    print(model_summary(shapes, "FLowHigh vector field"))
    pad_to = cfg.data.sampling_rate * 3
    # device_prefetch: uploads overlap the running step (a synchronous
    # batch-32 upload measured 3.6 s/step through the tunnel, PERF.md)
    data = batch_iterator(train_ds, cfg.train.batch_size, pad_to=pad_to,
                          device_prefetch=proc_cnt == 1,
                          process_index=proc_idx, process_count=proc_cnt)
    if proc_cnt > 1:
        # local shards -> one global batch-sharded jax.Array per step
        from .parallel import shard_global_batch
        base = data
        data = (shard_global_batch(mesh, b) for b in base)
    valid_iter = batch_iterator(valid_ds, min(cfg.train.batch_size,
                                              max(1, len(valid_ds))),
                                pad_to=pad_to, num_workers=1)
    valid_batches = [next(valid_iter) for _ in range(2)]
    valid_iter.close()  # stop its prefetch threads; batches are materialized
    state = None
    if args.resume:
        params = trainer.load_params(args.resume)
        state = trainer.init_state(jax.random.PRNGKey(cfg.train.random_seed))
        state = state.replace(params=params)
    trainer.fit(data, state=state, auto_resume=not args.resume,
                valid_batches=valid_batches)
    return 0


def cmd_vocoder(args) -> int:
    import jax
    import jax.numpy as jnp

    from .compat.torch_ckpt import map_vocoder_state_dict
    from .config import MelConfig, VocoderConfig
    from .models import BigVGAN, mel_encode
    from .train.data import load_wav_mono

    if args.config:
        cfg = VocoderConfig.from_json(args.config)
    else:
        cfg = VocoderConfig()
    net = BigVGAN(cfg)
    if args.checkpoint:
        import torch
        pkg = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
        params = map_vocoder_state_dict(pkg.get("generator", pkg), cfg)
    else:
        print("[vocoder] no --checkpoint: random weights (smoke mode)")
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, cfg.num_mels)))

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    apply_fn = jax.jit(net.apply)
    for wav in sorted(Path(args.input_dir).glob("*.wav")):
        audio, sr = load_wav_mono(wav)
        assert sr == 48000, f"{wav}: vocoder expects 48 kHz input, got {sr}"
        mel = mel_encode(jnp.asarray(audio)[None, :], MelConfig())
        y = np.asarray(apply_fn(params, mel))[0]
        _write_wav(out_dir / f"{wav.stem}_generated.wav", 48000, y)
        print(f"[vocoder] {wav.name} -> {wav.stem}_generated.wav")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="flowhigh_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("infer", help="file-to-file super-resolution")
    pi.add_argument("--input", default=None)
    pi.add_argument("--output", default=None)
    pi.add_argument("--input_dir", default=None,
                    help="serve every .wav in a directory through the "
                         "pipelined ServingPipeline (overlapped transfers)")
    pi.add_argument("--output_dir", default=None)
    pi.add_argument("--wire", default="float32", choices=["float32", "int16"],
                    help="device->host download format for --input_dir mode")
    pi.add_argument("--no_int16_wire", action="store_true",
                    help="upload mono 16-bit wavs as float32 instead of "
                         "the raw-int16 input wire (applies to both "
                         "--input and --input_dir modes); avoids the "
                         "extra per-(rate,bucket) compile when a "
                         "directory mixes int16 and float/stereo wavs")
    pi.add_argument("--ckpt_dir", default=None)
    pi.add_argument("--model_file", default="FLowHigh_basic_400k.pt")
    pi.add_argument("--time_step", type=int, default=1)
    pi.add_argument("--ode_method", default="midpoint", choices=["euler", "midpoint"])
    pi.add_argument("--cfm_method", default="basic_cfm",
                    choices=["basic_cfm", "independent_cfm_adaptive",
                             "independent_cfm_constant", "independent_cfm_mix"])
    pi.add_argument("--sigma", type=float, default=0.0)
    pi.add_argument("--architecture", default="transformer",
                    choices=["transformer", "convnext"])
    pi.add_argument("--n_layers", type=int, default=2)
    pi.add_argument("--streaming", action="store_true",
                    help="chunked overlap-add for long clips")
    pi.add_argument("--longform", default=None,
                    choices=["streaming", "single_pass"],
                    help="long-clip strategy: chunked streaming (default "
                         "for >30 s) or single-pass full-context CFM "
                         "(seam-free; use attn_flash on TPU)")
    pi.add_argument("--tiny", action="store_true",
                    help="tiny random model (smoke tests)")
    pi.set_defaults(fn=cmd_infer)

    pt = sub.add_parser("train", help="train the CFM vector field")
    pt.add_argument("--config", default=None,
                    help="reference configs/config.json schema")
    pt.add_argument("--steps", type=int, default=None)
    pt.add_argument("--save_dir", default=None)
    pt.add_argument("--resume", default=None)
    pt.add_argument("--tp", type=int, default=1, help="tensor-parallel width")
    pt.set_defaults(fn=cmd_train)

    pv = sub.add_parser("vocoder", help="standalone BigVGAN inference")
    pv.add_argument("--input_dir", required=True)
    pv.add_argument("--output_dir", required=True)
    pv.add_argument("--checkpoint", default=None)
    pv.add_argument("--config", default=None)
    pv.set_defaults(fn=cmd_vocoder)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
