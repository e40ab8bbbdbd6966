"""Round-13 optimization probe: time single queries solo and capture
their formatted plans.

    python tools/opt_probe.py q1 q2 ...        # time each, best-of-N
    PROBE_PLANS=plans/r13 PROBE_SUFFIX=_before python tools/opt_probe.py q1

Timing methodology matches bench.py exactly (noop sink, full-table
warmup first, best-of-N with PROBE_BEST_OF, default 3). Each query also
gets a construction-time measurement (DataFrame build, which includes
any eager checkpoints / first() probes inside the operator) separate
from the execution time, so "driver-side build jobs" vs "the final job"
can be told apart.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import SF_DIR, force, warmup
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: opt_probe.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    plans_dir = os.environ.get("PROBE_PLANS")
    suffix = os.environ.get("PROBE_SUFFIX", "")
    best_of = max(1, int(os.environ.get("PROBE_BEST_OF", "3")))
    spark = get_spark(app_name="opt-probe")
    # PROBE_CONF="k=v;k2=v2": runtime-settable SQL confs for A/B arms
    # (e.g. AQE thresholds) without touching session.py between runs
    for kv in filter(None, os.environ.get("PROBE_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
        print(f"PROBE-CONF {k.strip()}={v.strip()}", file=sys.stderr)
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    if not os.environ.get("PROBE_NO_WARMUP"):
        warmup(spark)
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        build_best = exec_best = total_best = None
        for _ in range(best_of):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            build, ex, tot = t1 - t0, t2 - t1, t2 - t0
            build_best = build if build_best is None else min(build_best, build)
            exec_best = ex if exec_best is None else min(exec_best, ex)
            total_best = tot if total_best is None else min(total_best, tot)
        out[name] = {
            "build_s": round(build_best, 3),
            "exec_s": round(exec_best, 3),
            "total_s": round(total_best, 3),
        }
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            qe = df._jdf.queryExecution()
            fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(qe.explainString(fmt))
        spark.sparkContext.setJobDescription(None)
        print(f"PROBE {name}: {json.dumps(out[name])}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
