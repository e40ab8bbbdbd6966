"""Diff two bench_full.json files (bench.py's complete per-query map —
VERDICT r10 task 3) and print regressions/improvements at the repo's
standard bar (>1.3x AND >0.3 s, the judge's regression criterion).

Run: python tools/bench_diff.py OLD.json NEW.json [--bar-ratio 1.3]
Exit code 1 if any regression. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(
        description="Diff two bench_full.json per-query maps"
    )
    p.add_argument("old_json")
    p.add_argument("new_json")
    p.add_argument("--bar-ratio", type=float, default=1.3)
    p.add_argument("--bar-abs", type=float, default=0.3)
    ns = p.parse_args()
    ratio_bar, abs_bar = ns.bar_ratio, ns.bar_abs
    old = json.load(open(ns.old_json))["queries"]
    new = json.load(open(ns.new_json))["queries"]
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
