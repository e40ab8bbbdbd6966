"""Count-min sketch (Cormode & Muthukrishnan 2005,
doi:10.1016/j.jalgor.2003.12.001): sublinear frequency summaries for
heavy-hitter detection over unbounded key domains.

Why it matters at 100 TB: an exact token/key frequency table is
|vocab|-sized and must be rebuilt per corpus; the sketch is a FIXED
``depth x width`` grid of counters that (a) aggregates with one keyed
shuffle whose output is at most depth*width rows, (b) merges across
corpora/partitions/days by plain cell-wise addition (a union + groupBy —
the same mergeability that makes it streamable), and (c) answers
point-frequency queries with one-sided error: estimate >= true count,
overshoot bounded by e*N/width with probability 1 - (1/e)^depth.

Engine fit: every hash is the md5 recipe from the oracle-parity kit, so
the whole sketch — not just its answers — is exactly reproducible in
DuckDB SQL; the contract query hashes the full grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_slot(key: Column, row: int, width: int) -> Column:
    """Row-seeded md5 slot hash — identical in DuckDB via
    ``('0x' || substr(md5('cms<row>|' || key), 1, 15))::BIGINT % width``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), key)), 1, 15), 16, 10
        ).cast("bigint")
        % F.lit(width)
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(row, slot, cnt)`` with at most depth*width
    rows. One pass, map-side expansion by ``depth`` (cheap, constant),
    one keyed shuffle that partial-aggregates map-side — hot keys
    collapse before the exchange, so skew cannot hurt it."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    key = F.col(key_col).cast("string")
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_slot(key, r, width).alias("slot"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("__w"),
    )
    return (
        cells.select(F.col("c.row").alias("row"), F.col("c.slot").alias("slot"), "__w")
        .groupBy("row", "slot")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (width, depth): cell-wise sum
    (union + one keyed shuffle). This is the cross-corpus / cross-day
    accumulation path — no re-scan of the original data."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "slot").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: probe each of the
    ``depth`` rows (broadcast-join the sketch — it is at most
    depth*width rows) and take the minimum. Estimates never undercount;
    absent cells read as 0."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_slot(key, r, width).alias("slot"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(F.col(key_col), F.col("p.row").alias("row"), F.col("p.slot").alias("slot"))
    joined = probes.join(F.broadcast(sketch), ["row", "slot"], "left").select(
        F.col(key_col), F.coalesce(F.col("cnt"), F.lit(0)).alias("__c")
    )
    return joined.groupBy(key_col).agg(F.min("__c").cast("bigint").alias("est"))
