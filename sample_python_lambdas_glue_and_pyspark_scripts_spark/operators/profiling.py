"""Data profiling — the statistics pass an intake pipeline runs before
committing a batch (null ratios, cardinalities, ranges, distributions).

The reference's validation suite (validator.py) asserts fixed predicates;
profiling is the other half of data quality: MEASURE the batch so drift
is visible before predicates fire. Same single-pass discipline as
``operators/validation.py``: every statistic that can share a scan does.

Scale notes:
- ``profile_table`` computes per-column null counts and distinct counts
  in ONE aggregate job. Exact multi-column DISTINCT uses Spark's Expand
  (input replicated once per profiled column before partial aggregation)
  — the exact/oracle posture. At 100 TB profile with
  ``exact_distinct=False``: approx_count_distinct's HLL sketches are
  one map-side pass with constant-size state per column.
- ``numeric_profile`` is pure map-side-partial aggregation (min / max /
  mean / stddev), one job for all columns, no Expand.
- ``equi_width_histogram`` is one aggregate for the range + one keyed
  count on the bucket index — bucket boundaries derive from the SAME
  float expression in the DuckDB oracle, so edges bin identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_null, n_distinct)``,
    one row per profiled column, all counted in a single aggregate pass
    (NULLs do not count toward ``n_distinct`` — both engines agree).

    ``exact_distinct=False`` swaps COUNT(DISTINCT) for
    approx_count_distinct (HLL) — the 100 TB posture; keep exact for
    oracle-checked runs and small batches.
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{i}")
            for i, c in enumerate(cols)
        ],
        *[distinct(c).alias(f"__d_{i}") for i, c in enumerate(cols)],
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.coalesce(F.col(f"__null_{i}"), F.lit(0)).cast("bigint").alias(
                    "n_null"
                ),
                F.col(f"__d_{i}").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")


def numeric_profile(
    df: DataFrame, columns: list[str], round_to: int = 6
) -> DataFrame:
    """Numeric summary ``(col_name, min_val, max_val, mean_val,
    stddev_val)`` as 6dp-rounded doubles, one map-side-partial aggregate
    for every column (stddev is the sample flavor, matching DuckDB's
    STDDEV_SAMP at the rounding contract)."""
    if not columns:
        raise ValueError("numeric_profile needs at least one column")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"numeric_profile: unknown columns {missing}")
    aggs = []
    for i, c in enumerate(columns):
        d = F.col(c).cast("double")
        aggs += [
            F.round(F.min(d), round_to).alias(f"__mn_{i}"),
            F.round(F.max(d), round_to).alias(f"__mx_{i}"),
            F.round(F.avg(d), round_to).alias(f"__av_{i}"),
            F.round(F.stddev_samp(d), round_to).alias(f"__sd_{i}"),
        ]
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__mn_{i}").alias("min_val"),
                F.col(f"__mx_{i}").alias("max_val"),
                F.col(f"__av_{i}").alias("mean_val"),
                F.col(f"__sd_{i}").alias("stddev_val"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    round_to: int = 4,
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Equi-depth (quantile) histogram: ``(bucket, lo, hi, n)`` where
    bucket boundaries are the exact interpolated percentiles at
    ``i/n_buckets`` — each bucket holds ~equal row counts regardless of
    skew (the histogram a query optimizer or drift monitor actually
    wants on skewed columns; pairs with :func:`equi_width_histogram`).

    Determinism: boundaries round to ``round_to`` dp (the
    ordered-set-aggregate parity band) before assignment, and a row's
    bucket is the COUNT of boundaries <= its value — both engines
    compare the same rounded cuts, so ties land identically. Duplicate
    boundaries on heavy-tied data simply leave some buckets empty.

    Plan: one exact-percentile aggregate (single row, broadcast back) +
    a map-side array count + one keyed count. At 100 TB pass
    ``approx_accuracy`` to swap the exact percentile for the
    ``approx_percentile`` SKETCH (bounded memory, rank error
    <= 1/accuracy per boundary) — the assignment side is unchanged; the
    ``depth_histogram_approx`` contract query pins the swap's error
    band against the exact form.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from .util import ensure_parallelism

    x = F.col(col).cast("double")
    # exact percentile partial-aggregates per partition; a small local
    # parquet reads as ONE task and serializes the whole sort into it —
    # fan out first (no-op on naturally-split inputs)
    vals = ensure_parallelism(df.filter(x.isNotNull()).select(x.alias("__x")))
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    frac_arr = F.array(*[F.lit(f) for f in fracs])
    if approx_accuracy is None:
        pctl = F.percentile(F.col("__x"), frac_arr)
    else:
        pctl = F.expr(
            f"approx_percentile(__x, array({', '.join(map(str, fracs))}),"
            f" {int(approx_accuracy)})"
        )
    cuts = vals.agg(
        F.transform(
            pctl,
            lambda q: F.round(q, round_to),
        ).alias("__cuts")
    )
    staged = vals.crossJoin(F.broadcast(cuts))
    bucket = F.size(
        F.filter(F.col("__cuts"), lambda q: F.col("__x") >= q)
    ).cast("integer")
    return (
        staged.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.round(F.min("__x"), 6).alias("lo"),
            F.round(F.max("__x"), 6).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def equi_width_histogram(
    df: DataFrame,
    col: str,
    n_buckets: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: ``(bucket, lo, hi,
    n)`` with ``bucket`` in [0, n_buckets); values at the top edge land
    in the last bucket, values outside an explicit ``lo``/``hi`` clamp
    into the edge buckets; NULLs are dropped; empty buckets emit no row.

    ``lo``/``hi`` default to the observed min/max (one extra aggregate,
    broadcast back). The bucket index is
    ``least(floor((x - lo) / ((hi - lo) / n)), n - 1)`` — written
    identically in the DuckDB oracle so FP edge cases bin the same.
    Degenerate range (lo == hi) puts everything in bucket 0.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    x = F.col(col).cast("double")
    vals = df.filter(x.isNotNull()).select(x.alias("__x"))
    if lo is None or hi is None:
        rng = vals.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        )
        staged = vals.crossJoin(F.broadcast(rng))
    else:
        staged = vals.withColumn("__lo", F.lit(float(lo))).withColumn(
            "__hi", F.lit(float(hi))
        )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    # greatest(..., 0) clamps below-range values into the first bucket
    # when explicit lo/hi narrow the range (no-op for the observed range)
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("__x") - F.col("__lo")) / width), F.lit(0)
            ),
            F.lit(n_buckets - 1),
        )
    ).cast("integer")
    return (
        staged.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.round(F.min(F.col("__lo") + F.col("bucket") * width), 6).alias("lo"),
            F.round(
                F.min(F.col("__lo") + (F.col("bucket") + 1) * width), 6
            ).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    hot_num: int = 1,
    hot_den: int = 10,
) -> DataFrame:
    """Join/aggregate skew census for a key column — the quantified
    input to the broadcast / salt / hot-route decision (the levers this
    repo has measured: salted ``cap_per_group`` 1.48×,
    ``salted_replicate_join`` 2.2×; a window over a 94%-hot key was the
    r8 straggler). Emits the ``top_n`` heaviest keys as
    ``(rank, key, cnt, n_rows, n_keys, share, cum_share, is_hot)``:
    shares 6dp of total rows, ``cum_share`` an integer prefix sum
    divided once, ``is_hot`` the RATIONAL threshold
    ``cnt·hot_den ≥ n_rows·hot_num`` (default: a key holding ≥ 1/10 of
    all rows) — integer comparisons, no float cutoff.

    Scale: one keyed count with map-side combine (hot keys collapse in
    the combiner — the reason a census like this is cheap even when the
    skew is why you are running it); the heaviest keys are then taken
    with ``orderBy(...).limit(top_n)`` (TakeOrdered — per-partition
    top-n then a k-sized driver merge, NO unpartitioned rank window:
    key cardinality is corpus-scale for a skew census, and ranking ALL
    keys through a single-partition window was the op's own straggler —
    round-11 advice fix). Rank and ``cum_share`` windows run on the
    ≤ ``top_n`` surviving rows only. NULL keys are counted too (NULLs
    skew reduce-side joins like any hot key) and sort after real keys
    on ties.
    """
    if top_n < 1 or hot_num < 1 or hot_den < 1:
        raise ValueError("key_skew_report: top_n and the hot rational must be >= 1")
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc_nulls_last())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc_nulls_last())
    top = top.withColumn("rank", F.row_number().over(w))
    wc = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("__ccnt", F.sum("cnt").over(wc))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "key",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            F.round(F.col("__ccnt") / F.col("n_rows"), 6).alias("cum_share"),
            (
                F.col("cnt") * F.lit(hot_den) >= F.col("n_rows") * F.lit(hot_num)
            ).alias("is_hot"),
        )
    )
