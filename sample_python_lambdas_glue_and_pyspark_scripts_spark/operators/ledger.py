"""Run-ledger operators: admission control + status roll-up (SURVEY.md §2.6 W1, §2.4 A8).

The reference keeps a LOAD_JOB_EXECUTION_STATUS MySQL table and computes
admission/status in Python loops over query results
(/root/reference/src/AnalyzeEtlWaitStatusLambda/index.py:99-196;
 /root/reference/src/TakeBackupDecisionLambda/index.py:69-153).
Here both are window/aggregation queries over a run-events DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def admission_rank(
    runs: DataFrame,
    max_concurrency: int,
    start_col: str = "start_time",
    id_col: str = "execution_id",
) -> DataFrame:
    """W1: rank-by-start-time admission control.

    ``row_number() OVER (ORDER BY start_time, execution_id) <= k`` — the
    reference sorts running executions by start time, tie-breaking on
    execution id, and admits the first k
    (AnalyzeEtlWaitStatusLambda/index.py:99-139,169-196).

    The input is the set of RUNNING executions — bounded and tiny — so the
    single-partition global window is fine; at scale, partition the window
    by tenant/cluster.
    """
    w = Window.orderBy(F.col(start_col).asc(), F.col(id_col).asc())
    return runs.withColumn("admission_rank", F.row_number().over(w)).withColumn(
        "admitted", F.col("admission_rank") <= F.lit(max_concurrency)
    )


def admission_rank_partitioned(
    runs: DataFrame,
    k: int,
    partition_col: str,
    start_col: str = "start_time",
    id_col: str = "execution_id",
) -> DataFrame:
    """W1 at scale: per-tenant admission (rank within each partition key,
    keep rank <= k). The shuffle is keyed on ``partition_col``; no global
    sort, so this survives arbitrary run-ledger cardinality."""
    w = Window.partitionBy(partition_col).orderBy(
        F.col(start_col).asc(), F.col(id_col).asc()
    )
    return runs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def status_rollup(
    events: DataFrame,
    run_col: str = "run_id",
    status_col: str = "status",
    opco_col: str = "opco_id",
) -> DataFrame:
    """A8: per-run success/failure accounting + terminal-status decision.

    Reference semantics (TakeBackupDecisionLambda/index.py:69-80,133-153):
    any RUNNING → RUNNING; else any FAILED → FAILED; else SUCCEEDED.
    Counters: total/successful/failed opcos per run.
    """
    agg = events.groupBy(run_col).agg(
        F.countDistinct(opco_col).alias("total_opco_count"),
        F.countDistinct(
            F.when(F.col(status_col) == "SUCCEEDED", F.col(opco_col))
        ).alias("success_count"),
        F.countDistinct(
            F.when(F.col(status_col) == "FAILED", F.col(opco_col))
        ).alias("failed_count"),
        F.max(F.when(F.col(status_col) == "RUNNING", 1).otherwise(0)).alias("__running"),
        F.max(F.when(F.col(status_col) == "FAILED", 1).otherwise(0)).alias("__failed"),
    )
    return agg.withColumn(
        "terminal_status",
        F.when(F.col("__running") == 1, F.lit("RUNNING"))
        .when(F.col("__failed") == 1, F.lit("FAILED"))
        .otherwise(F.lit("SUCCEEDED")),
    ).drop("__running", "__failed")


def idempotent_latest(
    ledger: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "updated_at",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Dedup retried run rows, keeping the latest per idempotency key.

    The reference dedups retries on (FILE_NAME, ETL_TIMESTAMP)
    (AnalyzeEtlWaitStatusLambda/index.py:80-88). Classic row_number()=1
    per key — the engine's general latest-record operator.
    """
    keys = keys or ["file_name", "etl_timestamp"]
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        ledger.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
