"""Slowly-changing-dimension type 2 (Kimball) — historized keyed merge.

The reference's load path overwrites by key (REPLACE / the engine's
``merge_upsert``); SCD2 is the historized variant every warehouse needs
next to it: instead of losing the old row, close it (``valid_to`` set to
the update's effective time) and open a new version. Queries against a
point in time filter ``valid_from <= t AND (valid_to IS NULL OR
valid_to > t)``.

Semantics of one ``scd2_apply`` batch (updates are a snapshot keyed by
the natural key, one row per key):
- key in updates, open row has IDENTICAL tracked values → no-op (no
  spurious versions; comparison is null-safe per column)
- key in updates, tracked values differ → the open row closes at the
  update's ``ts`` and a new open row starts at ``ts``
- key only in updates → a new open row
- key absent from updates → untouched
- CLOSED history rows are never touched

Plan shape: closed history passes through untouched (filter only); the
open rows full-outer-join the update snapshot on the key — ONE keyed
shuffle — and each joined row emits its 0/1/2 output versions through a
single ``explode`` of a case-built struct array, so the join output is
scanned once (no three-branch re-scan). At 100 TB the dimension is
key-partitioned; bucket both sides on the key (sources/bucketing.py)
and the join is exchange-free.

Determinism: output is a pure function of (current, updates); ties are
impossible because updates carry one row per key (enforced — MERGE's
cardinality rule, same as ``jdbc_merge_upsert``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply an update snapshot to an SCD2 dimension; returns the new
    dimension table (same schema as ``current``: keys + tracked_cols +
    valid_from + valid_to, ``valid_to`` NULL = open version)."""
    if not keys:
        raise ValueError("scd2_apply needs at least one key column")
    if not tracked_cols:
        raise ValueError(
            "scd2_apply needs at least one tracked column (nothing to "
            "version otherwise — use merge_upsert for key-only presence)"
        )
    for c in keys + tracked_cols + [valid_from, valid_to]:
        if c not in current.columns:
            raise ValueError(f"scd2_apply: column {c!r} missing from current")
    for c in keys + tracked_cols + [ts_col]:
        if c not in updates.columns:
            raise ValueError(f"scd2_apply: column {c!r} missing from updates")
    dup = (
        updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "scd2_apply: updates must carry one row per key (snapshot "
            "semantics) — aggregate to latest-per-key first"
        )

    out_cols = keys + tracked_cols + [valid_from, valid_to]
    closed = current.filter(F.col(valid_to).isNotNull()).select(*out_cols)
    open_rows = current.filter(F.col(valid_to).isNull())

    o = open_rows.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__oc_{c}") for c in tracked_cols],
        F.col(valid_from).alias("__ofrom"),
        F.lit(1).alias("__has_o"),
    )
    u = updates.select(
        *[F.col(k).alias(f"__uk_{k}") for k in keys],
        *[F.col(c).alias(f"__uc_{c}") for c in tracked_cols],
        F.col(ts_col).alias("__uts"),
        F.lit(1).alias("__has_u"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}") == F.col(f"__uk_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(u, cond, "full_outer")

    same = None
    for c in tracked_cols:
        eq = F.col(f"__oc_{c}").eqNullSafe(F.col(f"__uc_{c}"))
        same = eq if same is None else (same & eq)
    has_o = F.col("__has_o").isNotNull()
    has_u = F.col("__has_u").isNotNull()
    changed = has_o & has_u & ~same

    def _ver(key_side: str, col_side: str, vfrom, vto):
        return F.struct(
            *[F.col(f"__{key_side}_{k}").alias(k) for k in keys],
            *[F.col(f"__{col_side}_{c}").alias(c) for c in tracked_cols],
            vfrom.alias(valid_from),
            vto.alias(valid_to),
        )

    null_to = F.lit(None).cast(
        dict(current.dtypes)[valid_to]
    )
    versions = (
        F.when(
            changed,
            F.array(
                _ver("ok", "oc", F.col("__ofrom"), F.col("__uts")),
                _ver("uk", "uc", F.col("__uts"), null_to),
            ),
        )
        .when(has_o, F.array(_ver("ok", "oc", F.col("__ofrom"), null_to)))
        .otherwise(F.array(_ver("uk", "uc", F.col("__uts"), null_to)))
    )
    emitted = j.select(F.explode(versions).alias("__v")).select("__v.*")
    return closed.unionByName(emitted)


def scd2_snapshot(
    dim: DataFrame,
    at_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time view of an SCD2 dimension: the version of each key
    that was current at ``at_ts`` (rows whose validity interval covers
    it). Pure filter — partition/predicate pushdown applies."""
    t = F.lit(at_ts)
    return dim.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )
