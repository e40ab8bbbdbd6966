"""Streaming mode for the price_zone pipeline (SURVEY.md §7.1 M5).

The reference's incremental semantics are file-arrival-triggered runs
(S3 event → Lambda → Step Function, §2.8). Engine equivalent: a
file-source Structured Stream whose ``foreachBatch`` runs the SAME batch
pipeline (validate → quarantine → partitioned write → versioned load →
ledger) per micro-batch of newly-arrived files. The checkpointed source
log guarantees each file is processed exactly once across restarts —
replacing the reference's (file_name, etl_timestamp) idempotency key for
arrival tracking, while the ledger still records per-run outcomes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas as S
from ..operators.validation import price_zone_rules, validate_distributed
from ..streaming.incremental import read_file_stream, run_incremental
from .run_ledger import RunLedger
from .runs import new_run_id


@dataclass
class StreamingPipelineResult:
    batches: list[dict] = field(default_factory=list)


def run_price_zone_stream(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    active_opcos: list[str],
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Watch ``input_dir`` for CSV arrivals; per micro-batch: single-pass
    validate + quarantine, append clean rows partitioned by opco, record
    the run in the ledger. Returns (StreamingQuery, result-accumulator).

    Uses the lazy ``validate_distributed`` path (no driver collect per
    batch) — counts come from the matrix aggregate, so each batch costs
    two actions: matrix + partitioned write.
    """
    ledger = RunLedger(spark, f"{work_dir}/ledger")
    out_path = f"{work_dir}/clean"
    results = StreamingPipelineResult()

    stream = read_file_stream(
        spark,
        input_dir,
        S.PRICE_ZONE_STAGING_SCHEMA,
        fmt="csv",
        max_files_per_trigger=max_files_per_trigger,
        options={"header": "true"},
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.transform import price_zone_derive, price_zone_mapping

        execution_id = new_run_id(prefix=f"stream_batch_{batch_id}")
        mapped = price_zone_mapping(batch_df)
        clean, matrix = validate_distributed(
            mapped, price_zone_rules(active_opcos), "opco_id"
        )
        stats = matrix.agg(
            F.sum("__n").alias("total"),
            F.sum(F.when(~F.col("any_violation"), F.col("__n")).otherwise(0)).alias(
                "valid"
            ),
        ).collect()[0]
        total = int(stats["total"] or 0)
        valid = int(stats["valid"] or 0)
        (
            price_zone_derive(clean)
            .repartition("opco_id")
            .write.partitionBy("opco_id")
            .mode("append")
            .parquet(out_path)
        )
        ledger.record(
            file_name=f"batch_{batch_id}",
            etl_timestamp=str(batch_id),
            execution_id=execution_id,
            status="SUCCEEDED",
            file_type="stream",
            total_count=total,
            valid_count=valid,
            invalid_count=total - valid,
        )
        results.batches.append(
            {"batch_id": batch_id, "total": total, "valid": valid}
        )

    query = run_incremental(
        stream,
        process_batch,
        checkpoint=f"{work_dir}/checkpoint",
        available_now=available_now,
    )
    return query, results
