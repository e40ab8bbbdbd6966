"""Key-based merge upsert — the reference's REPLACE-INTO load semantics.

The reference bulk-loads with ``LOAD DATA FROM S3 ... REPLACE INTO
TABLE`` (/root/reference/src/price_zone/load_job.py:74-90): MySQL
REPLACE is delete-then-insert by primary key — incoming rows replace
existing rows with the same key wholesale, other rows survive. The
reference also stamps ``ARRIVED_TIME``/``UPDATED_TIME`` audit columns on
the way in (load_job.py:84-88).

Spark's jdbc writer has no upsert mode, so the engine expresses REPLACE
as a relational merge the caller can point at any sink (or a Delta
``MERGE INTO`` when a transactional table format is available):

    merged = source ∪ (target ⟕anti source on keys)

One anti-join shuffle keyed on the merge key + a union — partial
aggregation-free, collect-free, and if both sides are bucketed on the
key (sources/bucketing.py) even the anti-join is exchange-free.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """REPLACE-by-key merge: every target row whose key appears in
    ``source`` is replaced by the source row(s); all other target rows
    pass through. Schemas must match by name (unionByName).

    Matches MySQL REPLACE semantics including the multi-row case: ALL
    target rows with a matching key are removed, all source rows with
    that key are inserted.
    """
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(source)


def merge_upsert_audited(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    arrived_col: str = "arrived_time",
    updated_col: str = "updated_time",
    now_epoch: int | None = None,
) -> DataFrame:
    """``merge_upsert`` with the reference's audit-column stamping:
    incoming rows get ``arrived_time`` (kept if already present on the
    surviving target rows) and ``updated_time`` = load time — the
    ``SET ..., ARRIVED_TIME=..., UPDATED_TIME=...`` clause of
    load_job.py:84-88 as engine semantics."""
    now = int(time.time()) if now_epoch is None else now_epoch
    stamped = source.withColumn(arrived_col, F.lit(now).cast("bigint")).withColumn(
        updated_col, F.lit(now).cast("bigint")
    )
    if arrived_col not in target.columns:
        target = target.withColumn(arrived_col, F.lit(None).cast("bigint"))
    if updated_col not in target.columns:
        target = target.withColumn(updated_col, F.lit(None).cast("bigint"))
    return merge_upsert(target, stamped, keys)
