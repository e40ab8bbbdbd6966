"""Skyline (Pareto-dominance) operator — multi-criteria filtering Spark
has no built-in for (the "Integration of Skyline Queries into Spark SQL"
line of work, EDBT 2023; Börzsönyi et al. 2001 for the operator itself).

A row is in the skyline iff NO other row is at least as good on every
criterion and strictly better on at least one. This is the shape of
"give me the non-dominated tradeoffs" questions — cost vs quality,
latency vs recall, price vs size — that otherwise get hand-rolled as
O(n²) self-joins.

Scale design (the standard two-phase distributed skyline): each
partition computes its LOCAL skyline (mapInPandas, vectorized dominance
checks — no shuffle), then the union of local skylines is reduced to
the GLOBAL skyline in one final pass. Correct because dominance is
transitive: any point dominated in the full set is dominated by some
global-skyline point, which also survives its own partition's local
pass — so skyline(∪ skyline(partition_i)) = skyline(S). The final merge
runs in a single task sized by Σ|local skylines|, which for real
tradeoff data is orders of magnitude below |S| (for d criteria over
independent dims it is O(log^{d-1} n) per partition); a pathological
all-incomparable input (every row on the Pareto front) degenerates to
the full set, in which case the answer itself is corpus-sized and no
algorithm helps.

Determinism contract: the skyline is a SET — partitioning can reorder
the output but never change membership (ties on every criterion do not
dominate each other, so exact duplicates all survive). Comparisons are
raw value comparisons (no arithmetic), so float criteria compare
bit-identically across engines as long as the inputs match — round any
DERIVED criterion (avg etc.) to 6dp upstream per the parity kit.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dominance_filter(pdf, crit_cols, signs):
    """Rows of ``pdf`` not dominated by any other row (pandas/numpy).

    Sorted by the (minimized) first criterion so a row can only be
    dominated by an earlier kept row — one pass, O(n·|skyline|) with
    vectorized inner checks.
    """
    import numpy as np

    if len(pdf) == 0:
        return pdf
    M = pdf[crit_cols].to_numpy(dtype="float64", copy=True) * np.asarray(
        signs, dtype="float64"
    )
    order = np.lexsort(tuple(M[:, i] for i in range(M.shape[1] - 1, -1, -1)))
    M = M[order]
    kept_rows = []
    kept = np.empty((0, M.shape[1]), dtype="float64")
    for i in range(M.shape[0]):
        p = M[i]
        if kept.shape[0]:
            le = (kept <= p).all(axis=1)
            lt = (kept < p).any(axis=1)
            if bool((le & lt).any()):
                continue
        kept = np.vstack([kept, p[None, :]])
        kept_rows.append(order[i])
    return pdf.iloc[sorted(kept_rows)]


def skyline(df: DataFrame, criteria: dict[str, str]) -> DataFrame:
    """Non-dominated rows of ``df`` under ``criteria``: a mapping
    ``{column: "min" | "max"}`` (at least one entry; criterion columns
    must be numeric and non-null — filter/coalesce upstream).

    Example::

        skyline(parts, {"avg_price": "min", "max_size": "max"})

    Plan: mapInPandas local skyline per partition (no shuffle, output
    ≤ input), repartition(1) of the surviving candidates, one final
    dominance pass. Equivalent to the O(n²) ``NOT EXISTS`` self-join
    (the DuckDB oracle formulation) at a distributed-scan cost.
    """
    if not criteria:
        raise ValueError("skyline needs at least one criterion")
    bad = [d for d in criteria.values() if d not in ("min", "max")]
    if bad:
        raise ValueError(f"criteria directions must be min/max, got {bad}")
    crit_cols = list(criteria)
    signs = [1.0 if criteria[c] == "min" else -1.0 for c in crit_cols]
    null_guard = None
    for c in crit_cols:
        cond = F.col(c).isNotNull()
        null_guard = cond if null_guard is None else (null_guard & cond)
    clean = df.filter(null_guard)
    schema = clean.schema

    def local(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = _dominance_filter(pdf, crit_cols, signs)
            if len(out):
                yield out

    def global_pass(batches: Iterator) -> Iterator:
        # mapInPandas splits even a single partition into Arrow batches
        # (spark.sql.execution.arrow.maxRecordsPerBatch, 10k here), and
        # per-batch filtering would never check dominance ACROSS batches
        # — concatenate everything first, then one dominance pass
        import pandas as pd

        parts = list(batches)
        if parts:
            out = _dominance_filter(
                pd.concat(parts, ignore_index=True), crit_cols, signs
            )
            if len(out):
                yield out

    candidates = clean.mapInPandas(local, schema=schema)
    # the global pass must see every candidate at once: dominance across
    # partitions. Candidates are local skylines — small by construction
    # (see module docstring for the degenerate case).
    return candidates.repartition(1).mapInPandas(global_pass, schema=schema)


def skyline_grouped(
    df: DataFrame, group_cols: list[str], criteria: dict[str, str]
) -> DataFrame:
    """Per-group skyline: the non-dominated set WITHIN each group (the
    per-category Pareto front — "best price/size tradeoffs per brand").

    One keyed shuffle on the group columns, then the dominance filter
    runs per group in ``applyInPandas``; groups are independently
    parallel and dominance never crosses groups, so there is no global
    merge step at all. Per-group memory is O(|group|) rows — the same
    contract as every other grouped-kernel operator here (size groups
    accordingly; a single group is one task).
    """
    if not group_cols:
        raise ValueError("skyline_grouped needs at least one group column")
    if not criteria:
        raise ValueError("skyline needs at least one criterion")
    bad = [d for d in criteria.values() if d not in ("min", "max")]
    if bad:
        raise ValueError(f"criteria directions must be min/max, got {bad}")
    crit_cols = list(criteria)
    signs = [1.0 if criteria[c] == "min" else -1.0 for c in crit_cols]
    null_guard = None
    for c in crit_cols:
        cond = F.col(c).isNotNull()
        null_guard = cond if null_guard is None else (null_guard & cond)
    clean = df.filter(null_guard)
    schema = clean.schema

    def per_group(pdf):
        return _dominance_filter(pdf, crit_cols, signs)

    return clean.groupBy(*group_cols).applyInPandas(per_group, schema=schema)
