"""Skew-join stress probe: measures what operators/skew.py buys when one
join key holds a large fraction of the fact table.

Setup (deterministic, generated into /tmp): a 24M-row fact where 50% of
rows share ONE hot key and the rest spread uniformly over 100k keys, and a
100k-row dimension. Broadcast is disabled (autoBroadcastJoinThreshold=-1)
to simulate the 100 TB case where the dim outgrows the broadcast budget —
with broadcast allowed there is no reducer to skew and no salting needed.

Three strategies over the same parquet inputs, each run twice (timing the
second, warm run):
  plain        sort-merge join, AQE skew-join OFF — the naive plan whose
               slowest reducer owns the whole hot key
  aqe_skew     AQE skew-join ON (the default engine posture): runtime
               split of oversized partitions
  salted       operators/skew.py::salted_replicate_join (n_salts=16):
               dim replicated 16x, hot key spread over 16 reducers
               regardless of runtime statistics

Prints one JSON line; numbers land in BASELINE.md's scaling-probe section.
Run: python tools/skew_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import salted_replicate_join
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

N_FACT = 24_000_000
N_KEYS = 100_000
HOT_KEY = 7
HOT_FRAC_PCT = 75  # percent of fact rows carrying HOT_KEY
WORK = "/tmp/skew_probe"


def build_inputs(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    fact = spark.range(N_FACT).select(
        F.when(F.pmod("id", F.lit(100)) < HOT_FRAC_PCT, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    # 16 files so the scan parallelizes like a real multi-file table
    fact.repartition(16).write.parquet(f"{WORK}/fact")
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp_"), (F.col("id") % 50).cast("string")).alias("grp"),
    )
    dim.repartition(4).write.parquet(f"{WORK}/dim")


def consume(df) -> int:
    # group small enough to not dominate; forces the full join
    return df.groupBy("grp").agg(F.sum("v").alias("s")).count()


def timed(fn) -> float:
    fn()  # warm (scan caches, JIT)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark(app_name="skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    build_inputs(spark)
    fact = spark.read.parquet(f"{WORK}/fact")
    dim = spark.read.parquet(f"{WORK}/dim")

    def plain():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        return consume(fact.join(dim, "k"))

    def aqe_skew():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # default skewedPartitionThresholdInBytes (256m) is sized for
        # cluster executors; at this probe's volume the hot partition is
        # ~300MB of rows — lower the trigger so the split actually fires
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        try:
            return consume(fact.join(dim, "k"))
        finally:
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    def salted():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        return consume(salted_replicate_join(fact, dim, on="k", n_salts=16, how="inner"))

    results = {name: timed(fn) for name, fn in [
        ("plain", plain), ("aqe_skew", aqe_skew), ("salted", salted),
    ]}
    # restore the engine default
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps({
        "probe": "skew_join",
        "fact_rows": N_FACT,
        "hot_key_pct": HOT_FRAC_PCT,
        "seconds": results,
    }))


if __name__ == "__main__":
    main()
