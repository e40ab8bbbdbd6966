"""Range (interval) join — the second custom temporal operator.

``range_join(left, right, ...)`` pairs each left row with the right rows
of the same key whose timestamp falls in ``[left_ts + lower, left_ts +
upper]``.

Scale design: a plain theta-join on the inequality forces Spark into a
broadcast-nested-loop or a per-key cross product. Instead both sides are
bucketed into ``span``-sized time bins (span = upper - lower): a right row
can only match left rows in its own or the adjacent bin, so the join is
an EQUI-join on (key, bin) over the left side exploded to the two
candidate bins, followed by the exact range filter. Shuffle cost is
2x|left| + |right| keyed on (key, bin) — no quadratic blow-up, and bin
skew follows data skew, which AQE's skew-join handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` joined to same-key ``right`` rows with
    ``right_ts`` in ``[left_ts + lower_s, left_ts + upper_s]`` (seconds,
    inclusive). Timestamp columns must be TimestampType.

    how='inner' returns matched pairs (left columns + right columns);
    how='left' keeps unmatched left rows with NULL right columns.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    span_us = int(round((upper_s - lower_s) * 1_000_000))

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # a right row in bin b matches left rows whose window start falls in
    # bin b or b-1 → explode LEFT to both candidate bins of its window
    lo_us = l_us + F.lit(int(round(lower_s * 1_000_000)))
    l_binned = left.withColumn(
        "__bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(lo_us / span_us).cast("long"),
                    F.floor(lo_us / span_us).cast("long") + 1,
                )
            )
        ),
    )
    r_binned = right.withColumn("__bin", F.floor(r_us / span_us).cast("long"))

    joined = l_binned.join(
        r_binned,
        on=[on, "__bin"],
        how="inner",
    ).filter(
        (F.unix_micros(F.col(right_ts)) >= F.unix_micros(F.col(left_ts)) + int(round(lower_s * 1e6)))
        & (F.unix_micros(F.col(right_ts)) <= F.unix_micros(F.col(left_ts)) + int(round(upper_s * 1e6)))
    ).drop("__bin")

    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        unmatched = left.join(
            matched.select(*left.columns).distinct(), on=left.columns, how="left_anti"
        )
        for c in right.columns:
            if c not in left.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(right.schema[c].dataType)
                )
        return matched.unionByName(unmatched.select(*matched.columns))
    raise ValueError("how must be 'inner' or 'left'")


def range_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    count_col: str = "n_in_range",
) -> DataFrame:
    """Per-left-row count of same-key right rows in the window — the
    common sessionless "activity in the last N hours" feature. Left rows
    with zero matches keep count 0."""
    pairs = range_join(
        left.select(on, left_ts),
        right.select(F.col(on), F.col(right_ts)),
        on, left_ts, right_ts, lower_s, upper_s,
    )
    counts = pairs.groupBy(on, left_ts).agg(F.count(F.lit(1)).alias(count_col))
    return left.join(counts, on=[on, left_ts], how="left").fillna({count_col: 0})
