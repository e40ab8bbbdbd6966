"""Skew-handling operators (SURVEY.md §7.1 M7 hardening).

AQE's skew-join splitting handles most runtime skew; these are the
explicit levers for the cases AQE can't fix:

- ``salted_aggregate``: two-phase aggregation for heavily-skewed groupBy
  keys (one key holding >> 1/partitions of the data). Phase 1 aggregates
  on (key, salt) — spreading the hot key over N partitions — phase 2
  merges the partials. Works for any algebraic aggregate (sum/count/
  min/max); pass the merge expressions accordingly.
- ``salted_broadcast_join``: replicate-broadcast join for a skewed fact
  key against a small dimension: the dimension is exploded N× with salt,
  the fact picks a random salt — every fact partition joins locally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic-per-row salt in [0, n_salts).

    Row-position based (monotonically_increasing_id), not rand(): retried
    tasks of a deterministic source re-produce the same salts, and —
    unlike a hash of the row's columns — exact-duplicate rows (the classic
    skew payload) still spread across all salt buckets.
    """
    return df.withColumn(
        salt_col,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase groupBy for skewed keys.

    ``partial_aggs`` run per (key, salt); ``merge_aggs`` combine the
    partials per key. Example (count + sum):

        salted_aggregate(df, ["k"],
            [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")])
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)


def salted_replicate_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Skew-proof SHUFFLED fact⋈dim: replicate the dim N×, salt the fact.

    For the case where the dim is too large to broadcast AND the fact key
    is skewed: the shuffle keys on (key, salt), so the hot key's rows
    spread over n_salts reducers instead of one. (A broadcast join needs
    no salting at all — it has no reducers; use ``F.broadcast`` directly
    when the dim fits.) Only inner/left joins are supported: for
    right/full joins the replicated dim would emit n_salts duplicates of
    every unmatched dim key.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_replicate_join supports how='inner'|'left' only "
            "(replicated dim rows would duplicate unmatched keys)"
        )
    salted_facts = with_salt(facts, n_salts)
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(exploded_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")


# backwards-compat alias for the original (misleading) name
salted_broadcast_join = salted_replicate_join
