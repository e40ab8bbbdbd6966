"""Time-series regularization — resample to fixed intervals + gap-fill.

Event streams are irregular; models and dashboards want a dense grid.
Spark has window aggregation but no first-class gap-fill: buckets with
no events simply don't exist in a groupBy result. ``resample_ffill``
produces the DENSE per-key grid with forward-filled values — the
standard "resample().ffill()" of the pandas world, distributed.

Plan shape: one keyed aggregation to per-(key, bucket) values, one
key-sized aggregation for per-key bucket ranges, a map-side
``sequence``+``explode`` to generate the dense grid (rows emitted =
grid size, no shuffle), a keyed left join back, and one per-key ordered
window for the forward fill. Bucket indices are exact integer division
of epoch micros (``div``, never double ``floor`` — a 2^60 epoch value
is double-lossy), so DuckDB's ``//`` on epoch nanos lands on identical
buckets.

Grid-size guard: a key whose span divided by the interval exceeds
``max_buckets_per_key`` raises instead of silently exploding a
corpus-sized grid (one stray 1970 timestamp would otherwise generate
decades of hourly buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts: Column,
    value_col: str,
    interval_sec: int = 3600,
    max_buckets_per_key: int = 100_000,
) -> DataFrame:
    """Dense per-key time grid: ``(key, bucket, v_ffill, filled)`` where
    ``bucket = floor(epoch / interval_sec)``, one row per bucket from
    each key's first to last event, ``v_ffill`` the 6dp-rounded
    per-bucket mean forward-filled across empty buckets, and ``filled``
    True on gap rows. NULL keys/values are dropped; the first bucket of
    every key always has data, so ``v_ffill`` is never NULL.
    """
    if interval_sec < 1:
        raise ValueError("interval_sec must be >= 1")
    key = F.col(key_col)
    d_us = int(interval_sec) * 1_000_000
    base = (
        df.filter(key.isNotNull() & F.col(value_col).isNotNull())
        .select(
            key.alias("__k"),
            F.unix_micros(ts).alias("__us"),
            F.col(value_col).alias("__v"),
        )
        .withColumn("bucket", F.expr(f"__us div {d_us}"))
    )
    agg = base.groupBy("__k", "bucket").agg(
        F.round(F.avg("__v"), 6).alias("v")
    )
    rng = agg.groupBy("__k").agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    over = (
        rng.filter(
            (F.col("__hi") - F.col("__lo")) >= F.lit(int(max_buckets_per_key))
        )
        .limit(1)
        .count()
    )
    if over:
        raise ValueError(
            f"resample_ffill: some key spans more than {max_buckets_per_key} "
            f"{interval_sec}s buckets — a dense grid that size is almost "
            "always a data error (stray epoch-0 timestamp?); clean the "
            "input or raise max_buckets_per_key explicitly"
        )
    grid = rng.select(
        "__k", F.explode(F.sequence("__lo", "__hi")).alias("bucket")
    )
    j = grid.join(agg, ["__k", "bucket"], "left")
    w = (
        Window.partitionBy("__k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        F.col("__k").alias(key_col),
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
        F.col("v").isNull().alias("filled"),
    )


def ewma_scaled_value(value_col: str, mult: int) -> Column:
    """Scale a value column to fixed-point BIGINT, RAISING on negative
    inputs: the EWMA fold's domain is non-negative scaled values — a
    negative value breaks engine exactness (Spark's ``(n - n%d)/d``
    truncates toward zero for negative ``n`` while DuckDB ``//``
    floors), and a state of exactly ``-1`` (scaled −1/mult) would
    collide with the no-state sentinel and silently reset the key's
    history mid-fold. Shared by :func:`ewma_last` and
    ``streaming/ewma_state.ewma_update`` so neither path can admit a
    negative value unguarded."""
    xi = F.round(F.col(value_col).cast("double") * mult, 0).cast("bigint")
    return F.when(xi >= 0, xi).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "ewma: negative value in the fixed-point fold domain "
                    "(got scaled "
                ),
                xi.cast("string"),
                F.lit("); filter or shift the input first"),
            )
        ).cast("bigint")
    )


def ewma_fold(vals: Column, init: Column, alpha_num: int,
              alpha_den: int) -> Column:
    """Fold a scaled-integer value array onto an integer EWMA state
    (``-1`` = no state yet — safe because the value domain is
    non-negative, enforced upstream by :func:`ewma_scaled_value`, so no
    legitimate state can equal the sentinel): the exact fixed-point
    recursion shared by
    the batch operator (:func:`ewma_last`) and the streaming state
    (``streaming/ewma_state.py``). Resuming from a prior state is the
    SAME computation as folding the concatenation — the streaming ≡
    batch parity contract rests on this one expression."""
    num, den = int(alpha_num), int(alpha_den)
    two_den = 2 * den

    def _step(acc, x):
        n = 2 * (num * x + (den - num) * acc) + den
        # exact integer div: (n - n % two_den) / two_den — n is far
        # below 2^53 so the final double division is exact
        return F.when(acc == -1, x).otherwise(
            ((n - (n % two_den)) / two_den).cast("bigint")
        )

    return F.aggregate(
        F.filter(vals, lambda v: v.isNotNull()), init, _step
    )


def ewma_last(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
    scale: int = 2,
) -> DataFrame:
    """Final exponentially-weighted moving average per key, in FIXED
    POINT: values scale to integers at ``scale`` decimals and the
    recursion runs entirely in BIGINT arithmetic with half-up division —
    ``s_0 = x_0``, ``s_t = (2·(num·x_t + (den−num)·s_{t−1}) + den) div
    (2·den)`` — so both engines reproduce it bit-for-bit with NO float
    rounding contract at all. (A float recursion with per-step
    ROUND(α·x + (1−α)·prev, 6) measurably diverges one ulp between
    engines: 2-decimal inputs with α=0.3 land the true step value
    EXACTLY on the 7th-digit .5 boundary whenever the previous state's
    6th digit is odd — Spark's BigDecimal HALF_UP and DuckDB's binary
    round then disagree. Integer state has no boundary.)

    α = ``alpha_num/alpha_den`` (the rational-threshold convention).
    NULL values are skipped; the domain is NON-NEGATIVE values,
    ENFORCED — a negative value raises at fold time
    (:func:`ewma_scaled_value`; filter or shift the input first).
    Returns ``(key_col, n_points, ewma)`` with ``ewma``
    the descaled double rounded to 6dp.

    Scale shape: ONE keyed shuffle; the fold is a map-side O(n) array
    pass per key (the run-length-fold convention — per-key history must
    fit a row; for unbounded keys window the input first). State stays
    ≤ max_scaled_value, so the 2·den·state intermediate is exact far
    below 2^53."""
    num, den = int(alpha_num), int(alpha_den)
    if not (0 < num <= den):
        raise ValueError("ewma_last: need 0 < alpha_num <= alpha_den")
    mult = 10 ** int(scale)
    xi = ewma_scaled_value(value_col, mult)
    vals = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    xi.alias("x")))
        ),
        lambda st: st["x"],
    )
    fold = ewma_fold(vals, F.lit(-1).cast("bigint"), num, den)
    return (
        df.filter(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(fold.cast("double") / F.lit(float(mult)), 6).alias(
                "ewma"
            ),
        )
    )
