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


def hot_split_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: DataFrame | list | None = None,
    how: str = "inner",
    top_n: int = 20,
    hot_num: int = 1,
    hot_den: int = 10,
    max_hot_keys: int = 256,
) -> DataFrame:
    """Skew-split two-path fact⋈fact join: hot keys broadcast, cold
    residual sort-merge, union — result IDENTICAL to the plain join
    (the contract query's oracle is the plain join itself).

    The classic 100 TB straggler is a fact-fact equi-join whose key has
    a few corpus-scale-hot values (``profiling.key_skew_report`` is the
    census that finds them): the sort-merge shuffle lands every row of
    a hot key on ONE reducer, and when the hot key's match count
    explodes, AQE's skew-split can mitigate the partition size but the
    per-key work still serializes. This lever removes hot keys from the
    shuffle entirely:

    - **hot path**: both sides filtered to the hot keys; the RIGHT hot
      slice (rows of ≤ ``top_n`` keys — bounded by the census cap) is
      broadcast, so hot rows never enter an exchange and the hot join
      parallelizes over the LEFT's map partitions.
    - **cold path**: both sides anti-filtered and joined normally
      (sort-merge at fact sizes) — skew-free by construction, since the
      hot keys are gone.

    ``hot_keys``: a 1-column DataFrame or list of key values; ``None``
    derives them from ``key_skew_report(left, on, top_n, hot_num,
    hot_den)`` rows flagged ``is_hot`` (a ≤ top_n control-plane read).
    Membership tests compare on the STRING form of the key (matching
    the census's key encoding) — injective for the int/string keys this
    engine joins on, so the split is exact. NULL keys match neither
    filter and are dropped on both paths, exactly as an inner join
    drops them.

    Only ``how='inner'`` is supported: on outer joins the two paths
    would each emit their own unmatched rows and the union is no longer
    the plain join. If the hot slice of ``right`` is itself too large
    to broadcast (hot key × wide right), use ``salted_replicate_join``
    — this lever is for the common case where the right side's hot rows
    are bounded (e.g. a per-key dimension-ish slice of a fact).
    """
    if how != "inner":
        raise ValueError(
            "hot_split_join supports how='inner' only (outer-join rows "
            "would be emitted by both paths)"
        )
    if hot_keys is None:
        from .profiling import key_skew_report

        census = key_skew_report(
            left, on, top_n=top_n, hot_num=hot_num, hot_den=hot_den
        )
        hot = [r["key"] for r in census.filter(F.col("is_hot")).collect()]
    elif isinstance(hot_keys, DataFrame):
        hot = [
            r[0]
            for r in hot_keys.select(
                F.col(hot_keys.columns[0]).cast("string")
            ).distinct().collect()
        ]
    else:
        hot = [None if k is None else str(k) for k in hot_keys]
    hot = [k for k in hot if k is not None]
    if len(hot) > max_hot_keys:
        # the hot list becomes TWO isin literals in the plan; a large
        # literal array is analyzer/codegen cost paid per plan (the
        # Bloom-word-array lesson) — and a "hot set" this big is not a
        # skew problem, it is the whole key space
        raise ValueError(
            f"hot_split_join: {len(hot)} hot keys exceeds max_hot_keys="
            f"{max_hot_keys} — a hot set this large is not skew; use the "
            "plain join (AQE skew-split) or salted_replicate_join, or "
            "raise max_hot_keys explicitly"
        )
    if not hot:
        return left.join(right, on=on, how="inner")
    k = F.col(on).cast("string")
    hot_out = left.filter(k.isin(hot)).join(
        F.broadcast(right.filter(k.isin(hot))), on=on, how="inner"
    )
    cold_out = left.filter(~k.isin(hot)).join(
        right.filter(~k.isin(hot)), on=on, how="inner"
    )
    return hot_out.unionByName(cold_out)
