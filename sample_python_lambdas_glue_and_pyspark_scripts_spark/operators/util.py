"""Operator-level scale utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the input has fewer partitions than cores.

    Byte-based file splitting gives a few-MB table one partition, which
    serializes compute-heavy map stages (hashing, shingling, vector math)
    onto one core. Input bytes are a bad proxy for compute cost — this
    guard keys the partition count to the cluster's parallelism instead.
    A no-op when the input is already partitioned (so big scans keep
    their natural splits).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
