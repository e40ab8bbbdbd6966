"""Diff two bench_full.json files (bench.py's complete per-query map —
VERDICT r10 task 3) and print regressions/improvements at the repo's
standard bar (>1.3x AND >0.3 s, the judge's regression criterion).

Run: python tools/bench_diff.py OLD.json NEW.json [--bar-ratio 1.3]
Exit code 1 if any regression. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    ratio_bar, abs_bar = 1.3, 0.3
    for a in sys.argv[1:]:
        if a.startswith("--bar-ratio"):
            ratio_bar = float(a.split("=", 1)[1])
    old = json.load(open(args[0]))["queries"]
    new = json.load(open(args[1]))["queries"]
    both = sorted(set(old) & set(new))
    regr = {
        q: {"old": old[q], "new": new[q], "ratio": round(new[q] / old[q], 2)}
        for q in both
        if new[q] > ratio_bar * old[q] and new[q] - old[q] > abs_bar
    }
    impr = {
        q: {"old": old[q], "new": new[q], "ratio": round(new[q] / old[q], 2)}
        for q in both
        if old[q] > ratio_bar * new[q] and old[q] - new[q] > abs_bar
    }
    print(
        json.dumps(
            {
                "compared": len(both),
                "only_old": sorted(set(old) - set(new)),
                "only_new": sorted(set(new) - set(old)),
                "total_old": round(sum(old[q] for q in both), 1),
                "total_new": round(sum(new[q] for q in both), 1),
                "regressions": regr,
                "improvements": impr,
            }
        )
    )
    sys.exit(1 if regr else 0)


if __name__ == "__main__":
    main()
