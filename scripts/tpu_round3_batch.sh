#!/bin/bash
# Round-3 TPU measurement sequence — run when the tunnel recovers.
# Serializes everything (ONE TPU process at a time) and logs to /tmp/tpu_all_r3.log.
set -x
exec > /tmp/tpu_all_r3.log 2>&1
cd /root/repo
echo "=== probe ==="
timeout 240 python -c "
import jax, time, jax.numpy as jnp
t0=time.time(); d=jax.devices()
v=float((jnp.ones((8,128))+1).sum())
print('TPU-OK', d[0], v, round(time.time()-t0,1), flush=True)" || { echo "PROBE FAILED"; exit 1; }
echo "=== unit microbench + cap sweep ==="
timeout 3000 python scripts/bench_amp_unit.py
echo "=== bench.py ==="
timeout 3000 python bench.py
echo "=== e2e trace ==="
timeout 3000 python scripts/trace_e2e.py
echo "ALL DONE"
