"""Deterministic-compaction KLL-style quantile sketch (the bounded-error
member of the sketch shelf — Karnin, Lang & Liberty 2016 / the
Munro-Paterson deterministic compactor family).

``bottomk_value_sample`` is a uniform sample: rank error ~ n/sqrt(k),
probabilistic. This sketch gives a GUARANTEED worst-case rank error,
carried IN THE STATE as an exactly-tracked integer budget (the
self-measuring convention of ``hll_cardinality_report`` /
``sampled_quantile_report``): every quantile answered from the sketch is
provably within ``err_budget + max_weight`` ranks of its target, and the
contract query verifies that claim against the exact ranks.

Design — deterministic, canonical, partition-order-free:

- **State** = rows ``(level, val)`` per group, each row an input value
  carrying weight ``2^level``, at most ``k`` values per level, plus the
  exact ``n`` (compaction is weight-preserving, so ``sum(2^level) = n``)
  and ``err_budget``.
- **Compaction** of an over-full level (> k values, weight w = 2^l):
  sort; an odd maximum stays behind at level l; the rest pair up
  ``(a_i <= b_i)`` and pair ``i`` promotes element ``i % 2`` (alternating
  low/high — balances bias across compactions) to level l+1 at weight
  2w. For any query point x the sorted buffer has exactly ONE pair
  straddling x, and replacing that pair by its survivor changes
  est_rank(x) by at most w — so ``err_budget += 2^l`` per compaction is
  a PROVEN worst-case increment, and by induction
  ``|est_rank(x) − true_rank(x)| <= err_budget`` for every x. With
  per-level capacity k the budget totals ~ (n/k)·log2(n/k): k=512,
  n=200k gives a guaranteed band under 2% of n (the uniform sample's
  ~2% holds only at one standard deviation).
- **Canonical structure**: rows are assigned to ``n_blocks`` buckets by
  a CONTENT hash (xxhash64 of value + optional row id), per-block
  sketches build independently (one sorted compaction pass per block),
  and blocks fold pairwise in fixed order (0+1, 2+3, …) until one
  sketch remains. Every step is a pure function of its input multisets,
  so the final state is identical under ANY partitioning/shuffle order
  of the input (pinned by test), and merging the per-block sketches
  along the canonical structure IS the direct build — the literal
  merge ≡ direct law (pinned). For merges that do NOT align with the
  canonical blocks (per-epoch streaming states, cross-corpus unions)
  literal state equality is information-theoretically impossible for
  ANY compacting quantile summary — a compacted state cannot
  reconstruct its leaf multiset — so the merge law there is the ERROR
  CONTRACT: the merged sketch's self-reported budget (sum of parts +
  merge-compaction increments) still bounds the true rank error,
  exactly (pinned by test against the recombined data; the documented-
  limitation posture of the LSH corpus_fp retraction caveat).

100 TB posture: the heavy work (hashing, block grouping, per-block
sort) is one keyed shuffle; the fold rounds operate on sketch-sized
rows only (<= k·levels per group per block, block count halving each
round). Size ``n_blocks`` so one group's slice of a block fits an Arrow
batch (~n_rows/n_blocks); the state and every answer served from it are
O(k·log(n/k)) rows regardless of n. This is the documented 100 TB path
of the grouped quantile gates (``grouped_price_quantiles`` /
``sampled_quantile_report``): the exact global/grouped rank windows run
once at onboarding, the sketch serves after.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_W1 = "CAST(1 AS BIGINT)"  # shiftleft base — the weight of level 0


def _compact_levels(levels: list[np.ndarray], k: int) -> tuple[list[np.ndarray], int]:
    """Canonical normalize: compact every level holding > k values,
    cascading upward. Pure function of the per-level multisets (sorting
    erases arrival order); returns the levels and the EXACT worst-case
    rank-error increment (sum of 2^l over compactions performed)."""
    budget_add = 0
    lvl = 0
    while lvl < len(levels):
        buf = np.asarray(levels[lvl], dtype=np.float64)
        if buf.size > k:
            buf = np.sort(buf, kind="stable")
            if buf.size % 2 == 1:
                leftover, body = buf[-1:], buf[:-1]
            else:
                leftover, body = buf[:0], buf
            pairs = body.reshape(-1, 2)
            rows = np.arange(pairs.shape[0])
            promoted = pairs[rows, rows % 2]
            levels[lvl] = leftover
            if lvl + 1 == len(levels):
                levels.append(promoted)
            else:
                levels[lvl + 1] = np.concatenate(
                    [np.asarray(levels[lvl + 1], dtype=np.float64), promoted]
                )
            budget_add += 1 << lvl
        lvl += 1
    return levels, budget_add


def _levels_from_rows(level_arr: np.ndarray, val_arr: np.ndarray) -> list[np.ndarray]:
    out: list[np.ndarray] = []
    if level_arr.size == 0:
        return out
    for lvl in range(int(level_arr.max()) + 1):
        out.append(np.asarray(val_arr[level_arr == lvl], dtype=np.float64))
    return out


def _rows_from_levels(levels: list[np.ndarray]) -> tuple[list[int], list[float]]:
    lv: list[int] = []
    vals: list[float] = []
    for lvl, buf in enumerate(levels):
        lv.extend([lvl] * len(buf))
        vals.extend(float(v) for v in buf)
    return lv, vals


def _sketch_frame(
    key, group_cols: list[str], blk, lv: list[int], vals: list[float], n: int, budget: int
) -> pd.DataFrame:
    out = {c: [key[i]] * len(lv) for i, c in enumerate(group_cols)}
    if blk is not None:
        out["__blk"] = [blk] * len(lv)
    out["level"] = lv
    out["val"] = vals
    out["n"] = [n] * len(lv)
    out["err_budget"] = [budget] * len(lv)
    cols = list(group_cols) + (["__blk"] if blk is not None else []) + [
        "level", "val", "n", "err_budget",
    ]
    return pd.DataFrame(out, columns=cols)


def _merge_sketch_rows(pdf: pd.DataFrame, k: int) -> tuple[list, list, int, int]:
    """Merge the (level, val) rows of >= 1 sketches tagged by ``__sk``:
    concatenate level buffers, compact, sum the per-sketch n/budget
    (denormalized per sketch — one representative row each)."""
    levels = _levels_from_rows(
        pdf["level"].to_numpy(dtype=np.int64), pdf["val"].to_numpy()
    )
    per = pdf.groupby("__sk", sort=True)[["n", "err_budget"]].first()
    n = int(per["n"].sum())
    budget = int(per["err_budget"].sum())
    levels, add = _compact_levels(levels, k)
    lv, vals = _rows_from_levels(levels)
    return lv, vals, n, budget + add


def _group_schema(df: DataFrame, group_cols: list[str], with_blk: bool) -> str:
    parts = [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols]
    if with_blk:
        parts.append("`__blk` bigint")
    parts += ["level int", "val double", "n bigint", "err_budget bigint"]
    return ", ".join(parts)


def kll_sketch(
    df: DataFrame,
    val_col: str,
    group_cols: list[str] | None = None,
    k: int = 512,
    n_blocks: int = 16,
    id_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one content-keyed shuffle into ``n_blocks``
    canonical buckets, a per-block sorted compaction, then the fixed
    pairwise fold. ``id_col`` (a row key) spreads exact-duplicate
    values across blocks — pass it whenever the value column has heavy
    ties. NULL values are ignored (the sketch-family convention).
    Output rows: group_cols + (level, val, n, err_budget)."""
    if k < 2:
        raise ValueError("kll_sketch: k must be >= 2")
    if n_blocks < 1:
        raise ValueError("kll_sketch: n_blocks must be >= 1")
    group_cols = list(group_cols or [])
    seed = F.col(val_col).cast("string")
    if id_col is not None:
        seed = F.concat(seed, F.lit("|"), F.col(id_col).cast("string"))
    staged = df.where(F.col(val_col).isNotNull()).select(
        *group_cols,
        F.pmod(F.xxhash64(seed), F.lit(n_blocks)).alias("__blk"),
        F.col(val_col).cast("double").alias("__v"),
    )
    schema = _group_schema(df, group_cols, with_blk=True)

    def build_block(key, pdf):
        n = len(pdf)
        levels, budget = _compact_levels([pdf["__v"].to_numpy()], k)
        lv, vals = _rows_from_levels(levels)
        return _sketch_frame(
            key, group_cols, key[len(group_cols)], lv, vals, n, budget
        )

    state = staged.groupBy(*group_cols, "__blk").applyInPandas(build_block, schema)
    width = n_blocks
    while width > 1:
        state = _fold_round(state, group_cols, k, schema)
        width = (width + 1) // 2
        state = state.localCheckpoint(eager=False)
    return state.drop("__blk")


def _fold_round(
    state: DataFrame, group_cols: list[str], k: int, schema: str
) -> DataFrame:
    """One canonical fold round: the sketches in blocks 2i and 2i+1
    merge into block i. Sketch-sized work only."""

    def merge_pair(key, pdf):
        pdf = pdf.assign(__sk=pdf["__orig"])
        lv, vals, n, budget = _merge_sketch_rows(pdf, k)
        return _sketch_frame(
            key, group_cols, key[len(group_cols)], lv, vals, n, budget
        )

    staged = state.select(
        *group_cols,
        F.col("__blk").alias("__orig"),
        F.expr("CAST(__blk DIV 2 AS BIGINT)").alias("__blk"),
        "level",
        "val",
        "n",
        "err_budget",
    )
    return staged.groupBy(*group_cols, "__blk").applyInPandas(merge_pair, schema)


def kll_merge_tagged(
    tagged: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 512,
    tag_col: str = "__sk",
) -> DataFrame:
    """m-way merge of sketch states distinguished by ``tag_col`` (each
    tag one sketch, its rows carrying that sketch's denormalized
    n/err_budget): per group, concatenate level buffers, compact, sum
    n and budgets (+ the new compactions' increments). Concatenating
    per-level MULTISETS is order-free, so the m-way merge is canonical
    regardless of tag order — the property that lets the streaming read
    fold every committed epoch in ONE sketch-sized stage."""
    group_cols = list(group_cols or [])
    schema = _group_schema(tagged, group_cols, with_blk=False)

    def merge(key, pdf):
        lv, vals, n, budget = _merge_sketch_rows(pdf, k)
        return _sketch_frame(key, group_cols, None, lv, vals, n, budget)

    staged = tagged if tag_col == "__sk" else tagged.withColumnRenamed(
        tag_col, "__sk"
    )
    return staged.groupBy(*group_cols).applyInPandas(merge, schema)


def kll_merge(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 512,
) -> DataFrame:
    """Merge two sketch states built with the same ``k``. Aligned with
    the canonical blocks this IS the direct build (pinned literal law);
    for arbitrary splits the result keeps the error contract — the
    merged ``err_budget`` still bounds the true rank error of every
    answer, exactly."""
    u = a.withColumn("__sk", F.lit(0)).unionByName(
        b.withColumn("__sk", F.lit(1))
    )
    return kll_merge_tagged(u, group_cols, k)


def kll_quantiles(
    sketch: DataFrame,
    quantiles: tuple[tuple[int, int], ...] = ((1, 4), (2, 4), (3, 4), (19, 20)),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Answer rational quantiles from the sketch: for target rank
    ``r = ceil(n·num/den)`` (integer arithmetic — ``(n·num + den − 1)
    div den``, never float) return the smallest sketch value whose
    cumulative weight reaches r — a VALUE FROM THE DATA, the
    ``sampled_quantile_report`` convention. ``err_bound =
    err_budget + 2^max_level`` is the guaranteed band (the extra term
    is the weight granularity of the answering row). All windows are
    sketch-sized (the sketch IS the bounded state)."""
    if any(a < 1 or b < 1 or a > b for a, b in quantiles):
        raise ValueError("kll_quantiles: quantiles must be rationals in (0, 1]")
    group_cols = list(group_cols or [])
    from pyspark.sql import Window

    spark = sketch.sparkSession
    qdf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in quantiles], "q_num INT, q_den INT"
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("val", "level")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    cum = sketch.select(
        *group_cols,
        "val",
        "level",
        "n",
        "err_budget",
        F.expr(f"shiftleft({_W1}, level)").alias("__w"),
        F.max("level").over(wall).alias("__lmax"),
    ).select(
        *group_cols,
        "val",
        "n",
        "err_budget",
        F.sum("__w").over(w).alias("__cum"),
        F.expr(f"shiftleft({_W1}, __lmax)").alias("__wmax"),
    )
    j = cum.crossJoin(F.broadcast(qdf))
    target = F.expr("CAST((n * q_num + q_den - 1) DIV q_den AS BIGINT)")
    hit = j.filter(F.col("__cum") >= target)
    return (
        hit.groupBy(*group_cols, "q_num", "q_den")
        .agg(
            F.min("val").alias("est"),
            F.first("n").cast("bigint").alias("n_rows"),
            (F.first("err_budget") + F.first("__wmax"))
            .cast("bigint")
            .alias("err_bound"),
        )
    )


def kll_quantile_report(
    sketch: DataFrame,
    full: DataFrame,
    val_col: str,
    quantiles: tuple[tuple[int, int], ...] = ((1, 4), (2, 4), (3, 4), (19, 20)),
    group_cols: list[str] | None = None,
    max_bound_num: int = 1,
    max_bound_den: int = 50,
) -> DataFrame:
    """Self-measuring acceptance gate (the ``approx_aggregates``
    contract style): each estimate is checked against the EXACT rank
    band of its value in ``full`` — ``rank_ok`` is the guarantee "the
    target rank lies within ``err_bound`` of est's true rank band
    [#{x<est}, #{x<=est}]" (provable, so the oracle emits literal
    true); ``bound_ok`` asserts the self-reported bound is useful:
    ``err_bound·max_bound_den <= n·max_bound_num`` (default <= 2% of
    n). The exact side is one broadcast join + keyed aggregate — the
    gate you run once at onboarding; serving reads the sketch alone."""
    group_cols = list(group_cols or [])
    est = kll_quantiles(sketch, quantiles, group_cols)
    cond = None
    for c in group_cols:
        t = F.col(f"f.`{c}`") == F.col(f"e.`{c}`")
        cond = t if cond is None else (cond & t)
    f = full.where(F.col(val_col).isNotNull()).alias("f")
    e = F.broadcast(est.alias("e"))
    pairs = f.crossJoin(e) if cond is None else f.join(e, cond, "inner")
    v = F.col(f"f.`{val_col}`").cast("double")
    ranks = pairs.groupBy(
        *[F.col(f"e.`{c}`").alias(c) for c in group_cols],
        F.col("e.q_num").alias("q_num"),
        F.col("e.q_den").alias("q_den"),
        F.col("e.n_rows").alias("n_rows"),
        F.col("e.est").alias("est"),
        F.col("e.err_bound").alias("err_bound"),
    ).agg(
        F.sum(F.when(v < F.col("e.est"), 1).otherwise(0)).alias("__lt"),
        F.sum(F.when(v <= F.col("e.est"), 1).otherwise(0)).alias("__le"),
    )
    target = F.expr(
        "CAST((n_rows * q_num + q_den - 1) DIV q_den AS BIGINT)"
    )
    rank_ok = (F.col("__lt") - F.col("err_bound") < target) & (
        target <= F.col("__le") + F.col("err_bound")
    )
    bound_ok = (
        F.col("err_bound") * F.lit(int(max_bound_den))
        <= F.col("n_rows") * F.lit(int(max_bound_num))
    )
    return ranks.select(
        *group_cols,
        "q_num",
        "q_den",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        rank_ok.alias("rank_ok"),
        bound_ok.alias("bound_ok"),
    )
