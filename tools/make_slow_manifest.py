"""Regenerate tests/slow_manifest.txt from a pytest --durations=0 log.

Usage:
    SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q --durations=0 \
        > /tmp/pytest_durations.log 2>&1
    python tools/make_slow_manifest.py /tmp/pytest_durations.log [budget_sec]

Picks the smallest set of slowest tests whose removal brings the
remaining serial runtime under ``budget_sec`` (default 420 s — leaves
headroom under the driver's ~10-min window for session startup and
collection). The manifest holds full node IDs; tests/conftest.py
deselects them unless SPARK_GRAFT_FULL_TESTS=1.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

LINE = re.compile(r"^\s*([0-9.]+)s\s+(call|setup|teardown)\s+(\S+)")


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    log = sys.argv[1]
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 420.0
    per_test: dict[str, float] = defaultdict(float)
    with open(log) as fh:
        for ln in fh:
            m = LINE.match(ln)
            if m:
                per_test[m.group(3)] += float(m.group(1))
    if not per_test:
        sys.exit("no duration lines found — run pytest with --durations=0")
    total = sum(per_test.values())
    ordered = sorted(per_test.items(), key=lambda kv: -kv[1])
    dropped: list[tuple[str, float]] = []
    remaining = total
    for nodeid, sec in ordered:
        if remaining <= budget:
            break
        dropped.append((nodeid, sec))
        remaining -= sec
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "slow_manifest.txt",
    )
    with open(out, "w") as fh:
        fh.write(
            "# Slow-tier test node IDs deselected by default (fast tier).\n"
            "# Regenerate with tools/make_slow_manifest.py; run the FULL\n"
            "# suite with SPARK_GRAFT_FULL_TESTS=1 before claiming a round\n"
            f"# green. Source log: {os.path.basename(log)}; measured full\n"
            f"# serial test time {total:.0f}s; fast tier target "
            f"{budget:.0f}s -> {remaining:.0f}s across "
            f"{len(per_test) - len(dropped)} tests.\n"
        )
        for nodeid, sec in sorted(dropped):
            fh.write(f"{nodeid}  # {sec:.1f}s\n")
    print(
        f"wrote {out}: dropped {len(dropped)}/{len(per_test)} tests "
        f"({total - remaining:.0f}s of {total:.0f}s); fast tier ~{remaining:.0f}s"
    )


if __name__ == "__main__":
    main()
