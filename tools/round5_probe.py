"""Round-5 operator scale probes, reproducible (numbers in BASELINE.md).

Covers the families added in round 5 at 24M-row / 16x scale:
- profiling: exact (Expand) vs HLL profile, numeric summary, histogram
- SCD2: 24M-key open dimension x 8M-row update snapshot (half changed)
- resample_ffill: 24M events -> dense per-key hourly grid
- BM25 + edit-distance near-dup over 16x-replicated documents
  (replication is the adversarial dup-heavy case for the edit verify —
  the recorded lever is exact dedup upstream + max_bucket_size)

SOLO run required (concurrent JVMs inflate timings 1.3-3x).
Run: python tools/round5_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import profiling as P
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.dedup import (
    edit_distance_pairs,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.scd2 import scd2_apply
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.text import bm25_scores
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.timeseries import (
    resample_ffill,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

WORK = "/tmp/round5_probe"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(out: dict, key: str, fn) -> None:
    t0 = time.perf_counter()
    fn()
    out[key] = round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark(app_name="round5-probe")
    shutil.rmtree(WORK, ignore_errors=True)
    out: dict = {}

    # --- profiling at 24M x 4 cols --------------------------------------
    n = 24_000_000
    spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0).alias("v"),
        F.when(F.pmod("id", F.lit(37)) == 0, None)
        .otherwise(
            F.concat(
                F.lit("s_"),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(50_000)).cast("string"),
            )
        )
        .alias("s"),
    ).repartition(16).write.parquet(f"{WORK}/prof")
    t = spark.read.parquet(f"{WORK}/prof")
    t.count()
    timed(out, "profile_exact_sec", lambda: P.profile_table(t).count())
    timed(
        out, "profile_hll_sec",
        lambda: P.profile_table(t, exact_distinct=False).count(),
    )
    timed(
        out, "numeric_profile_sec",
        lambda: P.numeric_profile(t, ["k", "g", "v"]).count(),
    )
    timed(
        out, "histogram_sec",
        lambda: P.equi_width_histogram(t, "v", 50).count(),
    )

    # --- SCD2 at 24M dim x 8M updates ------------------------------------
    spark.range(24_000_000).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).cast("string").alias("st"),
        F.lit(0).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    ).repartition(16).write.parquet(f"{WORK}/dim")
    spark.range(0, 24_000_000, 3).select(
        F.col("id").alias("k"),
        F.when(F.pmod("id", F.lit(2)) == 0, F.lit("CHANGED"))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)).cast("string"))
        .alias("st"),
        F.lit(100).cast("bigint").alias("effective_ts"),
    ).repartition(8).write.parquet(f"{WORK}/upd")
    d = spark.read.parquet(f"{WORK}/dim")
    u = spark.read.parquet(f"{WORK}/upd")
    d.count(); u.count()
    timed(
        out, "scd2_24m_dim_8m_upd_sec",
        lambda: scd2_apply(d, u, keys=["k"], tracked_cols=["st"]).count(),
    )

    # --- resample at 24M events / 100k keys ------------------------------
    spark.range(24_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).cast("string").alias("u"),
        F.timestamp_seconds(
            F.lit(1_600_000_000)
            + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2000 * 3600))
        ).alias("t"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("value"),
    ).repartition(16).write.parquet(f"{WORK}/ev")
    e = spark.read.parquet(f"{WORK}/ev")
    e.count()
    timed(
        out, "resample_24m_events_sec",
        lambda: resample_ffill(e, "u", F.col("t"), "value", 3600).count(),
    )

    # --- BM25 + edit-distance over 16x documents --------------------------
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    big = docs
    for i in range(1, 16):
        big = big.union(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text"
            )
        )
    big.repartition(16).write.parquet(f"{WORK}/docs16x")
    b = spark.read.parquet(f"{WORK}/docs16x")
    out["n_docs_16x"] = b.count()
    timed(
        out, "bm25_16x_sec",
        lambda: force(
            bm25_scores(b, ["spark", "join", "vector", "stream"], top_k=25)
        ),
    )
    timed(
        out, "edit_16x_sec",
        lambda: out.__setitem__(
            "edit_pairs", edit_distance_pairs(b, threshold=0.9).count()
        ),
    )

    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
