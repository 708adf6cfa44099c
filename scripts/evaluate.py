#!/usr/bin/env python
"""Quality evaluation harness: LSD / high-band LSD / SNR over a corpus.

Measures restoration quality the way the SR literature does (and the way the
reference intended with its vestigial STFTMag transform, reference:
src/flowhigh/utils.py:85-108): degrade 48 kHz clips to a target rate, restore
with FlowHighSR, and compare restored-vs-original spectra. Works on a
directory of wavs or the synthetic corpus (no data needed).

Usage:
    python scripts/evaluate.py [--ckpt_dir DIR] [--data_dir DIR]
        [--rates 8000,16000,24000] [--n_clips 8] [--timestep 1] [--out r.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--rates", default="8000,16000,24000")
    p.add_argument("--n_clips", type=int, default=8)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--timestep", type=int, default=1)
    p.add_argument("--cfm_method", default="independent_cfm_adaptive")
    p.add_argument("--ode_method", default="euler")
    p.add_argument("--tiny", action="store_true", help="tiny random model (smoke)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flowhigh_tpu import FlowHighConfig, FlowHighSR
    from flowhigh_tpu.config import ModelConfig, VocoderConfig
    from flowhigh_tpu.dsp.filters import host_degrade
    from flowhigh_tpu.metrics import high_band_lsd, log_spectral_distance, snr_db
    from flowhigh_tpu.train.data import SyntheticAudioDataset, load_wav_mono

    if args.ckpt_dir:
        model = FlowHighSR.from_local(args.ckpt_dir, cfm_method=args.cfm_method)
        model.ode_method = args.ode_method
    else:
        cfg = FlowHighConfig()
        if args.tiny:
            cfg = cfg.replace(
                model=ModelConfig(dim_in=256, dim=64, depth=2, heads=2, dim_head=16),
                vocoder=VocoderConfig(
                    num_mels=256, upsample_initial_channel=32,
                    upsample_rates=(8, 5, 4, 3), upsample_kernel_sizes=(16, 10, 8, 6),
                    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),)))
        print("[eval] no checkpoint: random weights — numbers are a harness "
              "smoke, not model quality", file=sys.stderr)
        model = FlowHighSR(cfg, cfm_method=args.cfm_method,
                           ode_method=args.ode_method)
        model.init_params(jax.random.PRNGKey(0), fast=not args.tiny)

    # corpus
    clips = []
    if args.data_dir:
        for f in sorted(Path(args.data_dir).glob("**/*.wav"))[: args.n_clips]:
            wave, sr = load_wav_mono(f)
            assert sr == 48000, f"{f}: eval corpus must be 48 kHz"
            clips.append(wave[: int(48000 * args.seconds)])
    else:
        ds = SyntheticAudioDataset(n_items=args.n_clips, seconds=args.seconds)
        clips = [ds[i]["wave"] for i in range(args.n_clips)]

    rates = [int(r) for r in args.rates.split(",")]
    results = {}
    for rate in rates:
        lsds, hb_lsds, snrs, lsd_degraded = [], [], [], []
        for wave in clips:
            wave = wave / (np.abs(wave).max() + 1e-9)
            # degrade: cheby1 + down/up (valid-mode order 8 / ripple 0.05)
            cond48 = host_degrade(wave.astype(np.float64), 48000, rate, 8, 0.05)
            import scipy.signal as sps
            low = sps.resample_poly(cond48, rate, 48000)  # the actual low-rate input

            restored = model.generate(low.astype(np.float32), sr=rate,
                                      timestep=args.timestep)[0]
            n = min(len(restored), len(wave))
            ref = jnp.asarray(wave[:n])[None]
            est = jnp.asarray(restored[:n])[None]
            deg = jnp.asarray(cond48[:n].astype(np.float32))[None]
            lsds.append(float(log_spectral_distance(ref, est)[0]))
            hb_lsds.append(float(high_band_lsd(ref, est)[0]))
            snrs.append(float(snr_db(ref, est)[0]))
            lsd_degraded.append(float(log_spectral_distance(ref, deg)[0]))
        results[str(rate)] = {
            "lsd": float(np.mean(lsds)),
            "high_band_lsd": float(np.mean(hb_lsds)),
            "snr_db": float(np.mean(snrs)),
            "lsd_of_degraded_input": float(np.mean(lsd_degraded)),
            "n_clips": len(clips),
        }
        print(f"[eval] {rate} Hz -> 48 kHz: LSD {results[str(rate)]['lsd']:.3f} "
              f"(degraded input: {results[str(rate)]['lsd_of_degraded_input']:.3f}) "
              f"HB-LSD {results[str(rate)]['high_band_lsd']:.3f} "
              f"SNR {results[str(rate)]['snr_db']:.1f} dB")

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
