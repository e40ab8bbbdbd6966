"""File-arrival incremental processing (SURVEY.md §2.8).

The reference's "streaming" is S3-event-per-file triggering: a Lambda
classifies each arriving file (partial vs full) and launches the pipeline
(/root/reference/src/price_zone/s3_trigger_lambda.py:45-158). The Spark
mapping is the file-source Structured Stream with
``trigger(availableNow=True)``: each run drains newly-arrived files
exactly once (checkpointed), ``foreachBatch`` runs the batch pipeline per
micro-batch — same at-least-once + idempotent-run semantics the
reference got from its (file_name, etl_timestamp) ledger key.

Event-time windowing + watermarks (absent in the reference, required for
capability parity) are provided as plan builders usable in both batch
and streaming mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """File-source stream. ``max_files_per_trigger`` is the engine's
    admission-control knob (reference: workflow MAX_CONCURRENCY, O3)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def run_incremental(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch driver: run the batch pipeline per micro-batch.

    ``available_now=True`` = drain-everything-then-stop (the reference's
    one-run-per-file-arrival shape); False = continuous micro-batches.
    Exactly-once per file comes from the checkpointed file-source log;
    ``batch_fn`` must be idempotent per (batch_id) for replay safety —
    same contract as the reference's run-ledger dedup.
    """
    writer = stream_df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str = "5 minutes",
    watermark: str | None = "10 minutes",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Event-time tumbling window aggregation (batch or streaming).

    With a watermark (streaming), state for windows older than the
    watermark is dropped — late rows beyond it are discarded, the
    standard late-data policy.
    """
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    keys = [F.window(F.col(ts_col), window_duration).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return df.groupBy(*keys).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "10 minutes",
    aggs: list | None = None,
) -> DataFrame:
    """Sliding event-time windows (each row lands in duration/slide windows)."""
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    return df.groupBy(F.window(F.col(ts_col), window_duration, slide).alias("win")).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str = "5 minutes",
    key_cols: list[str] | None = None,
    watermark: str | None = "10 minutes",
    aggs: list | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge."""
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    keys = [F.session_window(F.col(ts_col), gap).alias("win")] + [
        F.col(c) for c in (key_cols or [])
    ]
    return df.groupBy(*keys).agg(*aggs)
