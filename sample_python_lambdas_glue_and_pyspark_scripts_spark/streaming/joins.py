"""Streaming join + watermark-dedup shapes (SURVEY.md §2.8 beyond the
reference's file-trigger incremental model).

The reference enriches incoming files against control tables by driver
lookups (OPCO_CLUSTER routing, /root/reference/src/pa/pa_etl_script.py:68-101);
in Structured Streaming that is a STREAM-STATIC join — the static dim
side is re-read and broadcast fresh every micro-batch, so slowly-changing
routing tables are picked up without restarting the query.

Late/duplicate handling (absent in the reference, which relies on S3
event at-least-once + a status-table dedup) maps to:
- ``with_watermark`` + windowed agg: late rows beyond the watermark are
  dropped, state is bounded — the property that lets a windowed agg run
  forever at 100 TB/day.
- ``dedup_within_watermark``: exactly-once by key within the lateness
  horizon (Spark's dropDuplicatesWithinWatermark) — the retry-dedup of
  the run ledger ((file_name, etl_timestamp) idempotency,
  /root/reference/src/AnalyzeEtlWaitStatusLambda/index.py:80-88) as a
  streaming operator with bounded state.
- ``stream_stream_join``: two streams joined within a time bound; both
  sides buffer only up to watermark + bound — the correlated-events
  shape (clicks ⨝ purchases) that no batch rerun can express
  incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream against a static dimension. The dim is broadcast
    (dimension tables are small by definition here) and is re-resolved
    per micro-batch — updates to the underlying dim files are visible
    without restarting the stream."""
    d = broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def with_watermark(
    stream: DataFrame, ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """Bound event-time lateness: rows older than max(event time) - delay
    are dropped by stateful operators downstream; state stays bounded."""
    return stream.withWatermark(ts_col, delay)


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once-by-key within the lateness horizon.

    Unlike plain ``dropDuplicates`` (whose state grows forever), state
    for a key is evicted once the watermark passes it — the only
    formulation that survives an unbounded stream.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    delay: str = "10 minutes",
) -> DataFrame:
    """Inner join of two streams on a key, with the right event required
    within ``[left_ts, left_ts + within]``. Watermarks on BOTH sides plus
    the time-range condition let Spark evict buffered rows — without
    them a stream-stream join must buffer both streams forever."""
    l = left.withWatermark(left_ts, delay)
    r = right.withWatermark(right_ts, delay)
    cond = (
        (l[on] == r[on])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    # drop the right copy of the key: both sides carry ``on`` after an
    # expression join, and any downstream reference would be ambiguous
    return l.join(r, cond, "inner").drop(r[on])
