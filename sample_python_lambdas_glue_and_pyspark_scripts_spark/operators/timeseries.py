"""Time-series regularization — resample to fixed intervals + gap-fill.

Event streams are irregular; models and dashboards want a dense grid.
Spark has window aggregation but no first-class gap-fill: buckets with
no events simply don't exist in a groupBy result. ``resample_ffill``
produces the DENSE per-key grid with forward-filled values — the
standard "resample().ffill()" of the pandas world, distributed.

Plan shape: one keyed aggregation to per-(key, bucket) values, one
key-sized aggregation for per-key bucket ranges, a map-side
``sequence``+``explode`` to generate the dense grid (rows emitted =
grid size, no shuffle), a keyed left join back, and one per-key ordered
window for the forward fill. Bucket indices are exact integer division
of epoch micros (``div``, never double ``floor`` — a 2^60 epoch value
is double-lossy), so DuckDB's ``//`` on epoch nanos lands on identical
buckets.

Grid-size guard: a key whose span divided by the interval exceeds
``max_buckets_per_key`` raises instead of silently exploding a
corpus-sized grid (one stray 1970 timestamp would otherwise generate
decades of hourly buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts: Column,
    value_col: str,
    interval_sec: int = 3600,
    max_buckets_per_key: int = 100_000,
) -> DataFrame:
    """Dense per-key time grid: ``(key, bucket, v_ffill, filled)`` where
    ``bucket = floor(epoch / interval_sec)``, one row per bucket from
    each key's first to last event, ``v_ffill`` the 6dp-rounded
    per-bucket mean forward-filled across empty buckets, and ``filled``
    True on gap rows. NULL keys/values are dropped; the first bucket of
    every key always has data, so ``v_ffill`` is never NULL.
    """
    if interval_sec < 1:
        raise ValueError("interval_sec must be >= 1")
    key = F.col(key_col)
    d_us = int(interval_sec) * 1_000_000
    base = (
        df.filter(key.isNotNull() & F.col(value_col).isNotNull())
        .select(
            key.alias("__k"),
            F.unix_micros(ts).alias("__us"),
            F.col(value_col).alias("__v"),
        )
        .withColumn("bucket", F.expr(f"__us div {d_us}"))
    )
    agg = base.groupBy("__k", "bucket").agg(
        F.round(F.avg("__v"), 6).alias("v")
    )
    rng = agg.groupBy("__k").agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    over = (
        rng.filter(
            (F.col("__hi") - F.col("__lo")) >= F.lit(int(max_buckets_per_key))
        )
        .limit(1)
        .count()
    )
    if over:
        raise ValueError(
            f"resample_ffill: some key spans more than {max_buckets_per_key} "
            f"{interval_sec}s buckets — a dense grid that size is almost "
            "always a data error (stray epoch-0 timestamp?); clean the "
            "input or raise max_buckets_per_key explicitly"
        )
    grid = rng.select(
        "__k", F.explode(F.sequence("__lo", "__hi")).alias("bucket")
    )
    j = grid.join(agg, ["__k", "bucket"], "left")
    w = (
        Window.partitionBy("__k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        F.col("__k").alias(key_col),
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
        F.col("v").isNull().alias("filled"),
    )
