#!/usr/bin/env python
"""Training-step throughput on the real TPU at the reference recipe scale
(dim 1024 / depth 2 / 256 mels, 2 s random crops). Prints one JSON line.

The reference trains batch 128 on one GPU (configs/config.json:33); here the
batch is a CLI arg (default 32 — one v5e chip's HBM comfortably fits it with
3 s clips; scale via the data mesh for the full 128)."""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="vector-field compute_dtype (params stay f32)")
    ap.add_argument("--chain", type=int, default=1,
                    help="steps dispatched back-to-back per loss fetch (the "
                         "fit() steady state fetches metrics every "
                         "log_every steps, not every step — chain>1 "
                         "amortizes the ~24-35 ms tunnel RTT out of the "
                         "per-step number; donated state chains server-side)")
    ap.add_argument("--ab", action="store_true",
                    help="interleave float32 and bfloat16 arms rep-by-rep in "
                         "one process (the same-weather-window protocol — "
                         "tunnel RTT drifts ±30%% across half-hours, "
                         "CLAUDE.md rule 5)")
    args = ap.parse_args()

    import jax

    cache = pathlib.Path(__file__).parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowhigh_tpu.config import FlowHighConfig, TrainConfig
    from flowhigh_tpu.train import Trainer

    def build(dtype):
        cfg = FlowHighConfig().replace(train=TrainConfig(
            batch_size=args.batch, num_train_steps=1000, num_warmup_steps=0,
            amp_dtype=dtype))
        tr = Trainer(cfg, cfm_method="independent_cfm_adaptive")
        return tr, tr.init_state(jax.random.PRNGKey(0))

    t_samp = int(48000 * args.seconds)
    rng = np.random.default_rng(0)
    batch = {
        "wave": (rng.standard_normal((args.batch, t_samp)) * 0.3).astype(np.float32),
        "cond": (rng.standard_normal((args.batch, t_samp)) * 0.3).astype(np.float32),
        "lengths": np.full((args.batch,), t_samp, np.int32),
    }

    dtypes = ["float32", "bfloat16"] if args.ab else [args.dtype]
    arms = {}
    for dt_name in dtypes:
        tr, state = build(dt_name)
        state, m = tr.train_step(state, batch)  # compile
        _ = float(m["loss"])
        arms[dt_name] = {"tr": tr, "state": state, "times": []}

    # steady-state compute: batches pre-staged on device (matches the data
    # pipeline's device_prefetch=True, where uploads overlap the running
    # step; a synchronous 74 MB host->device upload through the axon tunnel
    # otherwise dominates — measured 3.6 s/step vs ~0.15 s compute)
    dev_batches = [jax.device_put(batch) for _ in range(2)]
    for i in range(args.reps):
        for dt_name in dtypes:      # interleaved: both arms see the same RTT
            a = arms[dt_name]
            t0 = time.perf_counter()
            for j in range(args.chain):
                a["state"], m = a["tr"].train_step(
                    a["state"], dev_batches[(i * args.chain + j) % 2])
            _ = float(m["loss"])  # one honest fetch per chain group
            a["times"].append((time.perf_counter() - t0) / args.chain)

    out = {"metric": f"train_step_b{args.batch}_{args.seconds:g}s_devstaged"
                     + (f"_chain{args.chain}" if args.chain > 1 else "")}
    for dt_name in dtypes:
        dt = sorted(arms[dt_name]["times"])[args.reps // 2]
        key = "" if dt_name == "float32" else "_bf16"
        out[f"ms_per_step{key}"] = round(dt * 1e3, 1)
        out[f"clips_per_sec{key}"] = round(args.batch / dt, 1)
    if args.ab:
        out["bf16_speedup"] = round(
            out["ms_per_step"] / out["ms_per_step_bf16"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
