#!/bin/bash
# Round-3 continuation TPU queue (run ONE at a time — device lock).
# 1) packed-conv MXU dtype A/B on the full generate program (+ LSD delta)
# 2) train-step throughput f32 vs bf16 compute_dtype
set -x
set -o pipefail  # surface each bench's exit status through the tail pipe
cd "$(dirname "$0")/.."
timeout 1800 python scripts/bench_conv_dtype.py 2>&1 | tail -6 || echo "ARM FAILED: bench_conv_dtype rc=$?"
timeout 900 python scripts/bench_train.py --reps 10 2>&1 | tail -2 || echo "ARM FAILED: bench_train f32 rc=$?"
timeout 900 python scripts/bench_train.py --dtype bfloat16 --reps 10 2>&1 | tail -2 || echo "ARM FAILED: bench_train bf16 rc=$?"
