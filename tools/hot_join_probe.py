"""Fact-fact hot-key join probe: what operators/skew.py::hot_split_join
buys at 1x and 16x when one join key holds most of the LEFT fact.

Setup (deterministic, generated into /tmp): a LEFT fact where 60% of the
rows share ONE hot key and the rest spread uniformly over 50k keys, and a
RIGHT fact with a BOUNDED per-key row count (4 rows/key — the "right
side's hot rows are bounded" regime the lever documents; when the right
side is also unbounded-hot the answer itself is quadratic and no plan
fixes that). Output is therefore 4x the left row count on every strategy.

Strategies over the same parquet inputs (each run twice, second timed):
  plain      sort-merge join under the session defaults (AQE skew-join
             ON — the engine's baseline posture)
  hot_split  operators/skew.py::hot_split_join with the hot key taken
             from key_skew_report (census read included in the timing)

Both at 1x (500k left rows) and 16x (8M left rows), with the 1x control
arm re-run IN-SESSION (CLAUDE.md: cross-session sweep numbers are not
comparable across testdata/host states). Prints one JSON line; numbers
land in BASELINE.md. Run: python tools/hot_join_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.profiling import (
    key_skew_report,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
    hot_split_join,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

N_KEYS = 50_000
HOT_KEY = 7
HOT_PCT = 60
RIGHT_PER_KEY = 4
WORK = "/tmp/hot_join_probe"


def build(spark, name: str, n_left: int) -> tuple[str, str]:
    left = spark.range(n_left).select(
        F.when(F.pmod("id", F.lit(100)) < HOT_PCT, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("lv"),
    )
    lp, rp = f"{WORK}/{name}/left", f"{WORK}/{name}/right"
    left.repartition(16).write.mode("overwrite").parquet(lp)
    right = (
        spark.range(N_KEYS * RIGHT_PER_KEY)
        .select(
            F.pmod("id", F.lit(N_KEYS)).cast("bigint").alias("k"),
            (F.col("id") % 31).cast("double").alias("rv"),
        )
    )
    right.repartition(8).write.mode("overwrite").parquet(rp)
    return lp, rp


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark(app_name="hot-join-probe")
    # fact-fact regime: neither side fits the auto-broadcast budget
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    shutil.rmtree(WORK, ignore_errors=True)
    out: dict[str, dict] = {}
    for name, n_left in (("1x", 500_000), ("16x", 8_000_000)):
        lp, rp = build(spark, name, n_left)
        left, right = spark.read.parquet(lp), spark.read.parquet(rp)

        def plain():
            force(left.join(right, "k", "inner"))

        def split():
            hot = key_skew_report(left, "k", top_n=4, hot_num=1, hot_den=10)
            force(
                hot_split_join(
                    left, right, "k", hot_keys=hot.filter("is_hot").select("key")
                )
            )

        n_plain = left.join(right, "k", "inner").count()
        res = {"rows_out": n_plain, "plain_s": timed(plain), "hot_split_s": timed(split)}
        res["speedup"] = round(res["plain_s"] / res["hot_split_s"], 2)
        out[name] = res
    out["scale_ratio_hot_split"] = round(
        out["16x"]["hot_split_s"] / out["1x"]["hot_split_s"], 2
    )
    out["scale_ratio_plain"] = round(out["16x"]["plain_s"] / out["1x"]["plain_s"], 2)
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
