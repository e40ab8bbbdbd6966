"""As-of join — a custom operator Spark's built-ins lack.

``asof_join(left, right, ...)`` attaches, to each left row, the most
recent right row with the same key whose timestamp is <= the left row's
timestamp (the classic point-in-time/trades-quotes join).

Scale design: NOT the naive theta-join (left x right-per-key explosion,
then rank) — instead the union/last-value algorithm:

    tag right rows (carrying their payload) and left rows (payload NULL),
    union, single window per key ordered by (ts, tag), propagate the last
    non-null payload forward, keep the left rows.

Cost is one shuffle+sort keyed on the join key over |left|+|right| rows —
the same complexity as a sort-merge join, with no intermediate blow-up,
so it survives arbitrarily many right rows per key. Rows tied on
timestamp resolve right-before-left (<= semantics), ties among right rows
resolve by the ordered ``tiebreak`` column (highest wins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row (same ``on``
    key, right_ts <= left_ts), NULL when no right row precedes it.

    ``payload_cols`` are the right-side columns to attach. ``tiebreak``
    orders right rows sharing a timestamp (highest value wins).
    """
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left_row"),
        F.lit(None).cast(right.select(*payload_cols).schema).alias("__payload"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0)).alias("__tb"),
        F.lit(None).cast(l_tag.schema["__left_row"].dataType).alias("__left_row"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (<= semantics); among
    # right rows at equal ts the highest tiebreak sorts last (wins)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__left_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__asof.{c}").alias(c) for c in payload_cols],
    )
    return out
