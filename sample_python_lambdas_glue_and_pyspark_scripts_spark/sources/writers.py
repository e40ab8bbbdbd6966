"""Sinks (SURVEY.md §2.1 S5-S7, S10).

Scale notes:
- ``write_partitioned`` repartitions by the partition key before
  ``partitionBy`` so each output partition is written by few tasks
  (avoids the tasks x partitions small-file explosion; SURVEY.md §4.1).
- JDBC writes throttle with ``numPartitions`` — the engine equivalent of
  the reference's DB semaphore + connection pool
  (O2/O7, /root/reference/src/AnalyzeWaitOrLoadClusterLambda/index.py:15-17,
   load_job.py:389-397).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] = "opco_id",
    fmt: str = "parquet",
    mode: str = "overwrite",
    quote_disabled: bool = True,
    coalesce_per_partition: bool = True,
) -> None:
    """S5: hive-partitioned sink (reference: transform_spark_job.py:107-111).

    Engine default is parquet; fmt='csv' reproduces the reference's sink,
    including its disabled quoting (``quoteChar: -1`` →
    ``option("quote", "")``; SURVEY.md §7.2). The partition column is not
    written into the files — same contract as the reference's per-group
    sink (pa_etl_script.py:124).
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    out = df.repartition(*keys) if coalesce_per_partition else df
    writer = out.write.mode(mode).partitionBy(*keys)
    if fmt == "csv":
        writer = writer.option("header", "true")
        if quote_disabled:
            writer = writer.option("quote", "")
        writer.csv(path)
    elif fmt == "orc":
        # columnar alternative with the same pruning/pushdown contract as
        # parquet (both are tested for partition pruning + predicate
        # pushdown in test_sources/test_layout)
        writer.orc(path)
    else:
        writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    num_partitions: int = 5,
    properties: dict[str, str] | None = None,
    batch_size: int = 10000,
) -> None:
    """S7: bulk DB load (reference: load_job.py:74-90 LOAD DATA FROM S3).

    ``num_partitions`` caps concurrent connections — replacing the
    reference's QueuePool(pool_size=5) + cluster semaphore. REPLACE-INTO
    upsert semantics need a staged MERGE on the target DB (documented
    deviation, SURVEY.md §7.2); v1 supports append/overwrite.
    """
    (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**(properties or {}))
        .mode(mode)
        .save()
    )


def append_run_metrics(df: DataFrame, path: str) -> None:
    """S10: structured run ledger replacing the reference's append-to-JSON
    metadata log (metadata_aggregator.py:7-34)."""
    df.write.mode("append").parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: str | list[str] | None = None,
) -> None:
    """JSON-lines corpus sink (one object per line, splittable unless
    compressed with a non-splittable codec — prefer uncompressed or
    zstd-framed for re-read parallelism at scale)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        keys = (
            [partition_by]
            if isinstance(partition_by, str)
            else list(partition_by)
        )
        writer = writer.partitionBy(*keys)
    writer.json(path)
