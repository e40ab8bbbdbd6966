"""Privacy / re-identification QA over tabular training data:
k-anonymity census, below-k suppression, and l-diversity — the
compliance companions to the PII scrub (``text.pii_scrub`` removes
direct identifiers from TEXT; these measure and mitigate
QUASI-identifier linkage in structured columns, the Sweeney 2002
attack surface: 87% of the US population is unique on
(zip, birthdate, sex)-shaped triples).

The reference engine has no privacy surface; this extends the
curation shelf the same way the annotation family does.

Determinism: everything here is exact integer counting over
equivalence classes (a groupBy on the quasi-identifier columns); the
single reported ratio per census rounds once to 6dp. NULL
quasi-identifier values are a VALUE (standard treatment — NULL zip
codes form their own linkable class; groupBy already keys them
together), never dropped.

Scale: one keyed aggregate over the quasi-identifier tuple per
operator — class-bounded everything after; suppression is one semi
join of the table against the passing classes. Skewed classes are
groupBy-partial-agg friendly; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _classes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__csize")
    )


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity census (Sweeney 2002): one row ``(k, n_rows,
    n_classes, min_class_size, n_rows_below_k, pct_rows_below_k)``
    over the equivalence classes of the quasi-identifier tuple. The
    table IS k-anonymous iff ``min_class_size >= k`` (equivalently
    ``n_rows_below_k = 0``); the pct tells you what suppression would
    cost. ``pct_rows_below_k`` rounds once to 6dp; everything else is
    an exact integer. An empty table reports 0 classes and NULL
    min/pct (nothing to anonymize is not 'anonymous', ``try_divide``).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    classes = _classes(df, qi_cols)
    return classes.agg(
        F.lit(k).cast("int").alias("k"),
        F.coalesce(F.sum("__csize"), F.lit(0)).cast("bigint")
        .alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__csize").alias("min_class_size"),
        F.coalesce(
            F.sum(F.when(F.col("__csize") < k, F.col("__csize"))),
            F.lit(0),
        ).cast("bigint").alias("n_rows_below_k"),
    ).select(
        "k",
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_rows_below_k",
        F.round(
            F.try_divide(
                F.col("n_rows_below_k").cast("double"),
                F.col("n_rows").cast("double"),
            ),
            6,
        ).alias("pct_rows_below_k"),
    )


def suppress_below_k(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """The standard k-anonymity mitigation: drop every row whose
    quasi-identifier equivalence class has fewer than ``k`` members —
    the suppressed table is k-anonymous by construction (classes only
    ever shrink to zero, never below k), and the rows removed are
    exactly ``k_anonymity_report``'s ``n_rows_below_k`` (pinned by
    test). Original column order preserved (keyed semi joins move the
    join key to the front — the r9 note)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    passing = _classes(df, qi_cols).filter(F.col("__csize") >= k).select(
        *qi_cols
    )
    # NULL-safe equality on every qi column: NULL quasi-identifiers are
    # a VALUE here, and a plain semi join would drop every NULL-keyed
    # row regardless of class size
    cond = None
    right = passing.alias("__pk")
    for c in qi_cols:
        # alias-qualify EVERY reference (the self-join lineage rule):
        # the unqualified left side is AMBIGUOUS_REFERENCE on Spark 4
        # because `passing` derives from `df`
        piece = F.col(f"__t.{c}").eqNullSafe(F.col(f"__pk.{c}"))
        cond = piece if cond is None else cond & piece
    return df.alias("__t").join(right, cond, "left_semi").select(
        *[F.col(f"__t.{c}") for c in df.columns]
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity census (Machanavajjhala 2007): k-anonymity
    does not stop attribute disclosure when a class is UNIFORM on the
    sensitive column (everyone in the (zip, age) class has the same
    diagnosis — linkage reveals it without identifying anyone), so
    this reports, per the same equivalence classes, how many carry at
    least ``l`` distinct sensitive values: one row ``(l, n_classes,
    min_distinct_sensitive, n_classes_below_l, pct_classes_below_l)``.
    NULL sensitive values count as a distinct value (the class is not
    uniform if some rows decline the attribute). Exact integers; the
    pct rounds once to 6dp; empty table reports NULLs via
    ``try_divide``."""
    if l < 1:
        raise ValueError("l must be >= 1")
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    per_class = df.groupBy(*qi_cols).agg(
        # count_distinct ignores NULLs — add the null-presence flag so
        # a NULL sensitive value is a distinct value
        (
            F.countDistinct(sensitive_col)
            + F.max(
                F.when(F.col(sensitive_col).isNull(), 1).otherwise(0)
            )
        ).cast("bigint").alias("__nsens")
    )
    return per_class.agg(
        F.lit(l).cast("int").alias("l"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__nsens").alias("min_distinct_sensitive"),
        F.coalesce(
            F.sum(F.when(F.col("__nsens") < l, 1)), F.lit(0)
        ).cast("bigint").alias("n_classes_below_l"),
    ).select(
        "l",
        "n_classes",
        "min_distinct_sensitive",
        "n_classes_below_l",
        F.round(
            F.try_divide(
                F.col("n_classes_below_l").cast("double"),
                F.col("n_classes").cast("double"),
            ),
            6,
        ).alias("pct_classes_below_l"),
    )
