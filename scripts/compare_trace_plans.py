"""Join two trace_e2e per-op dumps (unit-fusion vs pairs-only) and print the
per-resblock-unit cost comparison — the IN-PROGRAM ground truth for the
unit-vs-pair fusion decision (round-3's per-op sweep used the single-ended
RTT-subtraction method that PERF.md round-4 showed can be wildly off).

Usage: python scripts/compare_trace_plans.py /tmp/trace_ops_true.json \
           /tmp/trace_ops_pairs.json
"""
import json
import re
import sys

a = json.load(open(sys.argv[1]))   # units mode
b = json.load(open(sys.argv[2]))   # pairs mode

KSIZES = {0: 3, 1: 7, 2: 11}


def block_info(i):
    stage, j = divmod(i, 3)
    return stage + 1, KSIZES[j]


# units mode: resblocks_<i>._unit_fused.<n> — n orders the 3 dilation units
units = {}
for name, v in a.items():
    m = re.match(r"resblocks_(\d+)\._unit_fused\.(\d+)", name)
    if m:
        units.setdefault(int(m.group(1)), []).append((int(m.group(2)), v))

# pairs mode: resblocks_<i>._act_then_conv.<n> — 2 pairs per dilation unit
pairs = {}
for name, v in b.items():
    m = re.match(r"resblocks_(\d+)\._act_then_conv\.(\d+)", name)
    if m:
        pairs.setdefault(int(m.group(1)), []).append((int(m.group(2)), v))

print("resblock  stage k   d_idx  unit_ms  2pairs_ms  delta(unit win +)")
tot_u = tot_p = 0.0
for i in sorted(set(units) | set(pairs)):
    st, k = block_info(i)
    us = sorted(units.get(i, []))
    ps = sorted(pairs.get(i, []))
    # pairs come 2 per unit, in dilation order
    for d_idx in range(max(len(us), len(ps) // 2)):
        u = us[d_idx][1] if d_idx < len(us) else float("nan")
        p2 = (ps[2 * d_idx][1] + ps[2 * d_idx + 1][1]
              if 2 * d_idx + 1 < len(ps) else float("nan"))
        if u == u:
            tot_u += u
        if p2 == p2:
            tot_p += p2
        print(f"rb{i:<3d}     s{st}   k{k:<3d} d[{d_idx}]  {u:7.3f}  "
              f"{p2:9.3f}  {p2 - u:+8.3f}")
print(f"\nunits total {tot_u:.2f} ms   pairs total {tot_p:.2f} ms")

ta = sum(v for n, v in a.items() if not n.startswith("jit__"))
tb = sum(v for n, v in b.items() if not n.startswith("jit__"))
print(f"whole-program device: units-mode {ta:.2f} ms, pairs-mode {tb:.2f} ms")
