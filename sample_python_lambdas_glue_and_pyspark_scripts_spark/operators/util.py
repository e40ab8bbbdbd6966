"""Operator-level scale utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Inputs smaller than cores x this are "small": a full repartition costs
# less than leaving any core idle on a compute-heavy stage.
SMALL_INPUT_BYTES_PER_CORE = 64 * 1024 * 1024


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan (file bytes for scans)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition small inputs so compute-heavy map stages use all cores.

    Byte-based file splitting gives a few-MB table one (or one *useful*)
    partition, which serializes hashing/vector-math stages onto a single
    core. Partition COUNT can lie — byte-range splits of a one-rowgroup
    parquet file put every row in one split — so the trigger is the
    plan-size estimate, not the partition count: inputs under
    ``cores x 64MB`` repartition unconditionally (the shuffle is trivially
    cheap at that size); bigger inputs keep their natural splits, so this
    is a no-op at 100 TB.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Probe the LOGICAL plan, never df.rdd: under AQE, materializing the
    # RDD of a plan that contains an exchange EXECUTES the upstream query
    # stages just to learn the partition count. An explicit upstream
    # repartition means the caller already fanned out — trust it.
    try:
        plan_str = df._jdf.queryExecution().logical().toString()
        if "Repartition" in plan_str:
            return df
    except Exception:
        pass
    try:
        small = estimated_size_bytes(df) < target * SMALL_INPUT_BYTES_PER_CORE
    except Exception:
        small = True
    if small:
        return df.repartition(target)
    return df
