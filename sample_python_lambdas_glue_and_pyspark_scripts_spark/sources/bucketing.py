"""Bucketed tables — shuffle-free co-located joins and aggregations.

THE join strategy for repeated fact-fact joins at 100 TB: if both sides
are written bucketed (and optionally sorted) on the join key with the
same bucket count, Spark's scan already satisfies the join's required
hash distribution — the sort-merge join runs with ZERO Exchange. A
repeated lineitem⨝orders pipeline pays the shuffle once at write time,
then never again; per-key aggregations on the bucket column also skip
their exchange.

This maps the reference's one physical-layout idea — everything keyed
and pre-split by opco_id (partitioned CSV sink,
/root/reference/src/price_zone/transform_spark_job.py:107-111; per-opco
load fan-out, load_job.py:101-110) — onto Spark's native bucketing,
which co-locates by HASH so it also serves joins, not just per-key
scans.

Bucketing requires the table catalog (`saveAsTable`): bucket metadata
lives in the metastore, not the parquet files. Plain `.parquet(path)`
writes cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    ``num_buckets`` should match across tables meant to join (unequal
    counts fall back to shuffling one side). Sorting within buckets
    additionally removes the join's Sort nodes.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata attaches automatically)."""
    return spark.table(table)


def count_exchanges(df: DataFrame) -> int:
    """Number of data-shuffle Exchange nodes in the (pre-AQE) physical
    plan — the property bucketing exists to zero out. Broadcast and
    reused exchanges don't count (not data shuffles)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<!Reused)Exchange (hash|range)partitioning", plan))
