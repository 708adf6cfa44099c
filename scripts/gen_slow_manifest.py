"""Regenerate tests/slow_tests.txt from a `pytest --durations=0 -q` log.

Usage: python scripts/gen_slow_manifest.py /tmp/full_suite.log [threshold_s]

Groups parametrized nodeids by their [param]-stripped prefix, sums call
durations per test function (the manifest lists prefixes, so a family is
quick only if the WHOLE family is), and writes every family whose total
call time >= threshold (default 12 s). The two driver-gate smokes
(test_matches_golden, test_dryrun_8_devices) are always kept quick.
"""

import re
import sys
from collections import defaultdict
from pathlib import Path

KEEP_QUICK = ("test_matches_golden", "test_dryrun_8_devices")


def main():
    log = Path(sys.argv[1]).read_text().splitlines()
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
    pat = re.compile(r"^([\d.]+)s call\s+(\S+)")
    fam = defaultdict(float)
    for line in log:
        m = pat.match(line.strip())
        if not m:
            continue
        dur, nodeid = float(m.group(1)), m.group(2)
        fam[nodeid.split("[")[0]] += dur
    slow = sorted(p for p, d in fam.items()
                  if d >= threshold and not p.endswith(KEEP_QUICK))
    out = Path(__file__).parent.parent / "tests" / "slow_tests.txt"
    header = """\
# Tests measured >= {th:g} s on the 1-core CI image (pytest --durations),
# marked slow by conftest.pytest_collection_modifyitems so the default
# red/green loop is `pytest -m "not slow"`. Entries are nodeid prefixes
# (parametrized families listed once, without the [param] suffix, judged by
# FAMILY-TOTAL call time). Regenerate:
#   python -m pytest tests/ -q --durations=0 > /tmp/full.log
#   python scripts/gen_slow_manifest.py /tmp/full.log
# test_matches_golden and test_dryrun_8_devices stay OUT of this list
# (core e2e + driver-gate smoke).
""".format(th=threshold)
    out.write_text(header + "\n".join(slow) + "\n")
    quick_total = sum(d for p, d in fam.items() if p not in slow)
    slow_total = sum(d for p, d in fam.items() if p in slow)
    print(f"wrote {len(slow)} slow families to {out}")
    print(f"call-time split: quick {quick_total:.0f}s / slow {slow_total:.0f}s")


if __name__ == "__main__":
    main()
