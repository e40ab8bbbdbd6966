"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching replace the reference's manual
  worker-sizing heuristic (/root/reference/src/price_zone/s3_trigger_lambda.py:72-117).
- ``spark.sql.shuffle.partitions`` is a *ceiling*; AQE coalesces down.
  On a real cluster set it ~2-3x total cores; locally it defaults to the
  local core count.
- Session timezone pinned to UTC so timestamp semantics are stable and
  match the DuckDB oracle regardless of host timezone.
- Arrow enabled for the Pandas-UDF operators (dedup/similarity/multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spark-graft-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's tuned defaults."""
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- optimizer / runtime re-planning -------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle / scan sizing ----------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", "134217728")  # 128 MiB
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python interop ------------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- determinism / oracle parity -----------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # TIMESTAMP(NANOS) parquet (events.ts) has no Spark type; read as
        # nanos-since-epoch long (ordering-compatible; convert on output
        # with functions.nanos_to_timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep hive-partition values as strings: 'opco_id=019' must read
        # back as '019', not int 19 (reference treats opco ids as strings)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # quieter local runs
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply the runtime-settable confs the contract queries depend on to
    an ARBITRARY caller-provided session (the driver builds its own,
    unconfigured). One definition — __spark_entry__ and every plan module
    must use this, not a private copy (conf drift broke only the copies'
    queries in the past):
    - nanosAsLong: events.parquet is TIMESTAMP(NANOS), unreadable otherwise;
    - UTC session timezone: formatted/epoch outputs must match the
      timezone-naive DuckDB oracle on any host;
    - rebase modes: stop ancient-date exceptions on vanilla sessions;
    - partition-value inference OFF: hive-partitioned round-trips must
      return opco_id="019" as the string it was written as, not int 19
      (the orchestrated pipelines read their own partitionBy output back).
    (ANSI stays on — Spark 4 default; null-on-failure uses try_*.)
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
    spark.conf.set("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
