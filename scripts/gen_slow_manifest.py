"""Regenerate tests/slow_tests.txt from `pytest --durations=0 -q` logs.

Usage: python scripts/gen_slow_manifest.py LOG [LOG2 ...] [--threshold S]

Groups parametrized nodeids by their [param]-stripped prefix, sums call
durations per test function (the manifest lists prefixes, so a family is
quick only if the WHOLE family is), and writes every family whose total
call time >= threshold (default 8 s). With multiple logs the MAX of the
per-log family totals decides — single-run durations on the 1-core image
are +-30% noisy, and a family that crosses the threshold in ANY honest
run belongs in the slow tier (the quick tier has a <600 s contract).
The two driver-gate smokes (test_matches_golden, test_dryrun_8_devices)
are always kept quick.
"""

import re
import sys
from collections import defaultdict
from pathlib import Path

KEEP_QUICK = ("test_matches_golden", "test_dryrun_8_devices")


def family_totals(log_path):
    pat = re.compile(r"^([\d.]+)s call\s+(\S+)")
    fam = defaultdict(float)
    for line in Path(log_path).read_text().splitlines():
        m = pat.match(line.strip())
        if m:
            fam[m.group(2).split("[")[0]] += float(m.group(1))
    return fam


def main():
    argv = list(sys.argv[1:])
    threshold = 8.0
    if "--threshold" in argv:
        i = argv.index("--threshold")
        threshold = float(argv[i + 1])
        del argv[i:i + 2]
    elif argv and re.fullmatch(r"[\d.]+", argv[-1]):
        threshold = float(argv.pop())
    per_log = [family_totals(p) for p in argv]
    fam = defaultdict(float)
    for totals in per_log:
        for p, d in totals.items():
            fam[p] = max(fam[p], d)
    slow = sorted(p for p, d in fam.items()
                  if d >= threshold and not p.endswith(KEEP_QUICK))
    out = Path(__file__).parent.parent / "tests" / "slow_tests.txt"
    header = """\
# Tests measured >= {th:g} s on the 1-core CI image (pytest --durations,
# MAX family-total across measurement runs — single-run durations are
# +-30% noisy there), marked slow by conftest.pytest_collection_modifyitems
# so the default red/green loop is `pytest -m "not slow"`. Entries are
# nodeid prefixes (parametrized families listed once, without the [param]
# suffix, judged by FAMILY-TOTAL call time). Regenerate:
#   python -m pytest tests/ -q --durations=0 > /tmp/full.log
#   python scripts/gen_slow_manifest.py /tmp/full.log [more.log ...]
# test_matches_golden and test_dryrun_8_devices stay OUT of this list
# (core e2e + driver-gate smoke).
""".format(th=threshold)
    out.write_text(header + "\n".join(slow) + "\n")
    quick_total = sum(d for p, d in fam.items() if p not in slow)
    slow_total = sum(d for p, d in fam.items() if p in slow)
    print(f"wrote {len(slow)} slow families to {out}")
    print(f"call-time split (max-over-logs): quick {quick_total:.0f}s / "
          f"slow {slow_total:.0f}s")


if __name__ == "__main__":
    main()
