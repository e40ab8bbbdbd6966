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
the GLOBAL skyline. Correct because dominance is transitive: any point
dominated in the full set is dominated by some global-skyline point,
which also survives its own partition's local pass — so
skyline(∪ skyline(partition_i)) = skyline(S).

The global merge is GUARDED: the candidate union is materialized and
counted, and while it exceeds ``merge_rows_per_task`` the local pass is
re-applied over a bounded tree of merge tasks (each round re-runs the
partition-local filter on ⌈n / merge_rows_per_task⌉ partitions —
dominance across the new partition boundaries keeps shrinking the set).
A front that will not compress below ``merge_rows_per_task`` — or grows
past ``max_candidates`` — raises :class:`SkylineFrontTooLargeError`
instead of silently scheduling a single task holding Σ|local skylines|
rows (the all-incomparable degenerate case: the answer itself is
corpus-sized and no algorithm helps; the caller should add criteria or
pre-filter).

Determinism contract: the skyline is a SET — partitioning can reorder
the output but never change membership (ties on every criterion do not
dominate each other, so exact duplicates all survive). Rows with NULL
**or NaN** in any criterion are dropped up front (NaN has no dominance
order; DuckDB sorts it greatest, numpy comparisons always fail — the
only cross-engine-stable semantics is exclusion, and oracle SQL must
mirror it with ``WHERE crit IS NOT NULL AND NOT isnan(crit)``).
Comparisons are raw value comparisons (no arithmetic), so float
criteria compare bit-identically across engines as long as the inputs
match — round any DERIVED criterion (avg etc.) to 6dp upstream per the
parity kit.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SkylineFrontTooLargeError(RuntimeError):
    """The Pareto front is too large for the single-task global merge.

    Raised by :func:`skyline` when the candidate set stays above
    ``merge_rows_per_task`` after tree-merge rounds (an incompressible
    — mostly all-incomparable — front) or exceeds ``max_candidates``
    outright. The result would be corpus-sized: add criteria, pre-filter
    / pre-aggregate the input, or raise the knobs explicitly if a task
    really can hold that many rows.
    """


def _dominance_filter(pdf, crit_cols, signs):
    """Rows of ``pdf`` not dominated by any other row (pandas/numpy).

    Sorted by the (minimized) criteria lexicographically so a row can
    only be dominated by an earlier kept row — one pass,
    O(n·|skyline|) with vectorized inner checks. The kept matrix is a
    preallocated slice-growing buffer (never per-row vstack — that was
    O(front²) memory traffic on wide fronts).
    """
    import numpy as np

    if len(pdf) == 0:
        return pdf
    M = pdf[crit_cols].to_numpy(dtype="float64", copy=True) * np.asarray(
        signs, dtype="float64"
    )
    order = np.lexsort(tuple(M[:, i] for i in range(M.shape[1] - 1, -1, -1)))
    Ms = M[order]
    if Ms.shape[1] == 2:
        # 2-criteria exact fast path, fully vectorized O(n log n): in
        # (x asc, y asc) order a row is dominated iff some EARLIER row
        # has y <= its y AND is not an exact duplicate of it (ties on
        # both criteria never dominate). Running min of y over strictly
        # smaller x gives the dominance test without the Python loop —
        # ~8x on the 3.2M-row probe.
        x, y = Ms[:, 0], Ms[:, 1]
        run_min = np.minimum.accumulate(y)
        # min of y among rows with x strictly less than this row's x:
        # positions where x changes value reset the "strict" boundary
        new_x = np.empty(len(x), dtype=bool)
        new_x[0] = True
        np.not_equal(x[1:], x[:-1], out=new_x[1:])
        # index of the last row BEFORE this row's x-group
        grp_start = np.maximum.accumulate(
            np.where(new_x, np.arange(len(x)), 0)
        )
        prev_min = run_min[np.maximum(grp_start - 1, 0)]
        # dominated by a strictly-smaller-x row with y <= mine, OR by an
        # equal-x row with strictly smaller y (same group, since sorted
        # by y within group the group's first row has the min y); the
        # grp_start > 0 mask keeps +inf y values in the first x-group
        # honest (no earlier row exists to dominate them)
        grp_min_y = y[grp_start]
        dominated = ((grp_start > 0) & (prev_min <= y)) | (grp_min_y < y)
        kept_sorted = np.flatnonzero(~dominated)
        return pdf.iloc[sorted(order[kept_sorted])]
    # k >= 3: block-vectorized dominance. Rows are processed in blocks;
    # each block is first screened against the kept matrix K in one
    # broadcasted (block x kept x d) reduction (sliced over K to bound
    # temp memory), then survivors resolve intra-block dominance with a
    # single (b x b x d) pairwise compare — correct without ordering
    # because dominance is transitive (if the dominator was itself
    # dominated, ITS dominator also dominates the victim), and exact
    # duplicates never dominate each other (strict-on-one check fails).
    # Replaces the per-row Python loop (O(n) interpreter iterations);
    # the numpy work is the same O(n * |front| * d) but runs at C speed.
    BLOCK = 512
    K_SLAB = 16_384
    n_rows, d = Ms.shape
    K = np.empty_like(Ms)  # upper bound: every row kept
    k = 0
    kept_rows: list = []
    for s in range(0, n_rows, BLOCK):
        B = Ms[s : s + BLOCK]
        alive = np.ones(len(B), dtype=bool)
        for ks in range(0, k, K_SLAB):
            KV = K[ks : min(ks + K_SLAB, k)]
            idx = np.flatnonzero(alive)
            if not len(idx):
                break
            BA = B[idx]
            # dominated by some kept row: KV <= p on all dims, < on one
            le = (KV[None, :, :] <= BA[:, None, :]).all(axis=2)
            lt = (KV[None, :, :] < BA[:, None, :]).any(axis=2)
            alive[idx[np.logical_and(le, lt).any(axis=1)]] = False
        idx = np.flatnonzero(alive)
        if not len(idx):
            continue
        BA = B[idx]
        if len(BA) > 1:
            le = (BA[None, :, :] <= BA[:, None, :]).all(axis=2)
            lt = (BA[None, :, :] < BA[:, None, :]).any(axis=2)
            dominated_intra = np.logical_and(le, lt).any(axis=1)
            idx = idx[~dominated_intra]
            BA = BA[~dominated_intra]
        K[k : k + len(BA)] = BA
        k += len(BA)
        kept_rows.extend(order[s + idx])
    return pdf.iloc[sorted(kept_rows)]


def _criteria_guard(df: DataFrame, criteria: dict[str, str]):
    """Validate criteria, drop NULL/NaN rows, return (clean, cols, signs)."""
    if not criteria:
        raise ValueError("skyline needs at least one criterion")
    bad = [d for d in criteria.values() if d not in ("min", "max")]
    if bad:
        raise ValueError(f"criteria directions must be min/max, got {bad}")
    crit_cols = list(criteria)
    signs = [1.0 if criteria[c] == "min" else -1.0 for c in crit_cols]
    guard = None
    for c in crit_cols:
        cond = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        guard = cond if guard is None else (guard & cond)
    return df.filter(guard), crit_cols, signs


def skyline(
    df: DataFrame,
    criteria: dict[str, str],
    *,
    merge_rows_per_task: int = 200_000,
    max_candidates: int = 2_000_000,
) -> DataFrame:
    """Non-dominated rows of ``df`` under ``criteria``: a mapping
    ``{column: "min" | "max"}`` (at least one entry; criterion columns
    must be numeric — NULL/NaN rows are dropped, see module docstring).

    Example::

        skyline(parts, {"avg_price": "min", "max_size": "max"})

    Plan: mapInPandas local skyline per partition (no shuffle, output
    ≤ input), candidate union materialized + counted, a bounded tree of
    re-merge rounds while the count exceeds ``merge_rows_per_task``,
    then one final single-task dominance pass. Equivalent to the O(n²)
    ``NOT EXISTS`` self-join (the DuckDB oracle formulation) at a
    distributed-scan cost. Raises :class:`SkylineFrontTooLargeError`
    rather than scheduling an unboundedly large final task.
    """
    clean, crit_cols, signs = _criteria_guard(df, criteria)
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

    # localCheckpoint(eager=True) materializes the candidates so the
    # guard count is free of recompute and the returned (lazy) plan
    # reads the stored blocks — no persist/unpersist bookkeeping to leak
    n_input = clean.count()
    candidates = clean.mapInPandas(local, schema=schema).localCheckpoint(eager=True)
    n = candidates.count()
    if n > merge_rows_per_task and n >= 0.9 * n_input:
        # The partition-local pass removed (almost) nothing. Two inputs
        # look like this: (a) all-incomparable data, where no merge round
        # will compress either and refusal is the only honest answer, and
        # (b) a criterion-correlated LAYOUT (e.g. data sorted by one
        # criterion), where each partition is an anti-chain but rows
        # across partitions dominate heavily and ONE re-merge round would
        # collapse the front. Disambiguate with a bounded uniform sample
        # ACROSS partitions (mixing breaks the layout): a subsample of an
        # anti-chain is an anti-chain (kept fraction stays ~1.0), while
        # case (b) compresses in the sample. Probe cost is one
        # criteria-only scan + an O(sample * front_sample) local pass —
        # refusal stays seconds on the adversarial 1.6M probe instead of
        # paying a full quadratic merge round to learn the same thing.
        # fraction alone, NO .limit(): CollectLimit fills from the first
        # partitions it scans, so sample+limit is biased toward early
        # partitions — a sorted layout whose LATER partitions dominate
        # the earlier ones would probe as an anti-chain and be falsely
        # refused. A bare Bernoulli sample draws from EVERY partition
        # (expected probe_rows rows, tight binomial spread at 20k).
        probe_rows = 20_000
        probe = (
            candidates.select(*crit_cols)
            .sample(fraction=min(1.0, probe_rows / n), seed=7)
            .toPandas()
        )
        probe_kept = _dominance_filter(probe, crit_cols, signs)
        if len(probe_kept) >= 0.9 * len(probe):
            raise SkylineFrontTooLargeError(
                f"skyline local pass kept {n} of {n_input} rows (> "
                f"merge_rows_per_task={merge_rows_per_task}) and a "
                f"{len(probe)}-row cross-partition sample kept "
                f"{len(probe_kept)} — the input is (near-)all-incomparable "
                "and the front is corpus-sized; add criteria, pre-filter, "
                "or raise the knobs explicitly"
            )
    rounds = 0
    while n > merge_rows_per_task:
        if rounds >= 4:
            # geometric shrink would have landed by now; a crawl toward
            # the threshold is the incompressible case in slow motion
            raise SkylineFrontTooLargeError(
                f"skyline front still has {n} candidates after {rounds} "
                f"tree-merge rounds (merge_rows_per_task={merge_rows_per_task})"
                " — add criteria, pre-filter, or raise the knobs explicitly"
            )
        rounds += 1
        if n > max_candidates:
            raise SkylineFrontTooLargeError(
                f"skyline candidate set has {n} rows (> max_candidates="
                f"{max_candidates}); the Pareto front is near-corpus-sized — "
                "add criteria, pre-filter, or raise max_candidates explicitly"
            )
        fanin = max(2, math.ceil(n / merge_rows_per_task))
        reduced = (
            candidates.repartition(fanin)
            .mapInPandas(local, schema=schema)
            .localCheckpoint(eager=True)
        )
        m = reduced.count()
        if m >= n:
            # incompressible: candidates are mutually non-dominating
            # across every tried partitioning — the front IS this big
            raise SkylineFrontTooLargeError(
                f"skyline front does not compress below merge_rows_per_task="
                f"{merge_rows_per_task} (stuck at {m} candidates) — the "
                "result is all-incomparable at this size; add criteria, "
                "pre-filter, or raise merge_rows_per_task explicitly"
            )
        candidates, n = reduced, m
    # the final pass sees every candidate at once (dominance across
    # partitions) in one task bounded by merge_rows_per_task
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
    clean, crit_cols, signs = _criteria_guard(df, criteria)
    schema = clean.schema

    def per_group(pdf):
        return _dominance_filter(pdf, crit_cols, signs)

    return clean.groupBy(*group_cols).applyInPandas(per_group, schema=schema)
