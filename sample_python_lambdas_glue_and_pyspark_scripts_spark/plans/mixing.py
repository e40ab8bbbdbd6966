"""Training-mix planning: temperature-scaled source weights → exact-
proportion downsample → achieved-mix census — the "assemble the data
recipe" composition next to the curation cascade
(``plans/curation_batch.py``), built from the individually-proven
mixing operators.

Pipeline (all map-side / control-plane sized — sources are few):

1. weights ∝ mass_g^alpha (``operators/sampling.temperature_weights``
   rule, computed HERE as a Spark aggregate with ``F.round(..., 6)`` —
   Spark HALF_UP, the oracle parity kit — NOT Python ``round()``,
   whose banker's rounding diverges at .5 boundaries, CLAUDE.md);
2. largest exact-proportion subset (``mix_to_proportions``: the
   scarcest source relative to its target binds the total, everything
   else hash-downsamples with integer bucket thresholds);
3. optional global budget trim: one keep-fraction applied uniformly
   via a second hash filter, so the recipe shares survive the trim in
   expectation and the census reports what was ACHIEVED, not assumed;
4. census: one row per source — available mass, weight, kept mass,
   achieved share — the observability face a mix decision actually
   reads.

Reference scope note: the reference engine has no sampling/mixing
surface (SURVEY.md §1.1); this is training-data extension surface,
citing the mT5/XLM-R temperature-mixing rule (Xue et al. 2021,
arXiv:2010.11934 §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import BUCKETS, hash_bucket, mix_to_proportions


def temperature_weights_df(
    df: DataFrame,
    alpha: float = 0.3,
    group_col: str = "source",
    weight_unit_col: str | None = None,
) -> DataFrame:
    """``(group_col, weight)`` with ``weight = round(mass^alpha, 6)``
    under Spark HALF_UP rounding — the oracle-exact sibling of
    ``sampling.temperature_weights`` (which returns a plain dict
    rounded with Python's banker's ``round``; fine as a control-plane
    helper, wrong inside an oracle-checked report). NULL groups and
    zero-mass groups drop, as in the dict form."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    unit = F.col(weight_unit_col) if weight_unit_col else F.lit(1)
    return (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.sum(unit).cast("double").alias("__mass"))
        .filter(F.col("__mass") > 0)
        .select(
            group_col,
            F.round(F.pow(F.col("__mass"), F.lit(float(alpha))), 6).alias(
                "weight"
            ),
            F.col("__mass").alias("avail_mass"),
        )
    )


def plan_training_mix(
    docs: DataFrame,
    alpha: float = 0.3,
    group_col: str = "source",
    weight_unit_col: str | None = None,
    id_col: str = "doc_id",
    seed: str = "mix|",
    budget: int | None = None,
    budget_seed: str = "mixtrim|",
) -> tuple[DataFrame, DataFrame]:
    """Compose the mix: temperature weights → largest exact-proportion
    subset → optional uniform budget trim. Returns ``(mixed_docs,
    census)`` where ``census`` is one row per source: ``(source,
    avail_mass, weight, kept_mass, achieved_share)`` (masses BIGINT in
    ``weight_unit_col`` units — rows when None; share of the kept
    total, 6dp).

    The budget trim applies ONE keep-fraction (``budget / kept_mass``,
    6dp-rounded into an integer bucket threshold) to every source via
    an independent hash seed — proportions survive in expectation and
    the census reports the achieved shares, so a drifted trim is
    visible, never silent. ``kept_mass`` for the fraction is one
    bounded aggregate (a scalar control read, the temperature_weights
    precedent)."""
    wdf = temperature_weights_df(
        docs, alpha, group_col, weight_unit_col
    ).localCheckpoint(eager=True)
    weights = {
        r[group_col]: float(r["weight"]) for r in wdf.collect()
    }
    mixed = mix_to_proportions(
        docs, weights, group_col, weight_unit_col, id_col, seed
    )
    unit = F.col(weight_unit_col) if weight_unit_col else F.lit(1)
    if budget:
        kept_mass = mixed.agg(
            F.sum(unit).cast("double").alias("m")
        ).collect()[0]["m"] or 0.0
        if kept_mass > budget:
            frac = round(float(budget) / kept_mass, 6)
            thr = int(round(frac * BUCKETS, 0))
            mixed = mixed.filter(
                hash_bucket(id_col, budget_seed) < F.lit(thr)
            )
    mixed = mixed.localCheckpoint(eager=False)
    kept = mixed.groupBy(group_col).agg(
        F.sum(unit).cast("bigint").alias("kept_mass")
    )
    total = kept.agg(
        F.sum("kept_mass").cast("double").alias("tk")
    ).alias("tg")
    census = (
        wdf.join(kept, group_col, "left")
        .crossJoin(F.broadcast(total))
        .select(
            group_col,
            F.col("avail_mass").cast("bigint").alias("avail_mass"),
            "weight",
            F.coalesce(F.col("kept_mass"), F.lit(0)).cast("bigint").alias(
                "kept_mass"
            ),
            F.round(
                F.coalesce(F.col("kept_mass"), F.lit(0)) / F.col("tg.tk"), 6
            ).alias("achieved_share"),
        )
    )
    return mixed, census


def training_mix_sweep(
    docs: DataFrame,
    alphas: tuple[float, ...] = (0.0, 0.3, 0.7),
    group_col: str = "source",
    weight_unit_col: str | None = None,
    id_col: str = "doc_id",
    seed: str = "mix|",
) -> DataFrame:
    """Temperature sweep for the mix planner — the tuning view behind
    the α choice (Xue et al. 2021 sweep α before fixing it): the
    per-(α, source) census ``(alpha, source, avail_mass, weight,
    kept_mass, achieved_share)`` for several temperatures from ONE
    corpus pass. Masses pre-aggregate per (source, hash bucket) — the
    SAME bucket rule :func:`..operators.sampling.mix_to_proportions`
    filters docs by, so summing buckets below a threshold EQUALS the
    mass of the docs that filter keeps — and every α's thresholds and
    kept masses are then computed over that bounded table (occupied
    buckets ≤ min(corpus rows, sources × BUCKETS); each α costs a
    broadcast-join filter + a sources-sized aggregate, never a corpus
    re-scan — the ``cross_source_dup_sweep`` design applied to
    mixing).

    Each sweep point is EXACTLY :func:`plan_training_mix`'s census at
    that α (same HALF_UP weight rounding, same integer bucket
    thresholds; pinned by test).
    """
    from ..operators.sampling import BUCKETS, hash_bucket

    if not alphas:
        raise ValueError("training_mix_sweep: no alphas")
    unit = F.col(weight_unit_col) if weight_unit_col else F.lit(1)
    tb = (
        docs.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col), hash_bucket(id_col, seed).alias("__b"))
        .agg(F.sum(unit).cast("bigint").alias("__m"))
        .localCheckpoint(eager=False)
    )
    avail = (
        tb.groupBy(group_col)
        .agg(F.sum("__m").cast("double").alias("__avail"))
        .filter(F.col("__avail") > 0)
        .localCheckpoint(eager=False)
    )
    out: DataFrame | None = None
    for a in alphas:
        w = avail.select(
            group_col,
            "__avail",
            F.round(F.pow(F.col("__avail"), F.lit(float(a))), 6).alias(
                "weight"
            ),
        )
        total = w.agg(F.min(F.col("__avail") / F.col("weight")).alias("__T"))
        thr = w.crossJoin(F.broadcast(total)).select(
            group_col,
            "__avail",
            "weight",
            F.round(
                F.round(
                    F.col("weight") * F.col("__T") / F.col("__avail"), 6
                )
                * F.lit(BUCKETS),
                0,
            )
            .cast("bigint")
            .alias("__thr"),
        )
        kept = (
            tb.join(F.broadcast(thr.select(group_col, "__thr")), group_col)
            .filter(F.col("__b") < F.col("__thr"))
            .groupBy(group_col)
            .agg(F.sum("__m").cast("bigint").alias("kept_mass"))
        )
        tot = kept.agg(
            F.sum("kept_mass").cast("double").alias("tk")
        ).alias("tg")
        row = (
            thr.join(kept, group_col, "left")
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(float(a)).alias("alpha"),
                F.col(group_col),
                F.col("__avail").cast("bigint").alias("avail_mass"),
                "weight",
                F.coalesce(F.col("kept_mass"), F.lit(0))
                .cast("bigint")
                .alias("kept_mass"),
                F.round(
                    F.coalesce(F.col("kept_mass"), F.lit(0)) / F.col("tg.tk"),
                    6,
                ).alias("achieved_share"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
