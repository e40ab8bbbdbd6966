"""Sort-clustered data layout for min/max data skipping (SURVEY.md §7.1
M7 hardening; beyond-reference scale lever).

Partition pruning (``writers.write_partitioned``) eliminates whole
directories; the next pruning tier is INSIDE files: parquet stores
min/max statistics per row group and per file, and Spark's scan skips
row groups whose stats cannot match the pushed filter. Those stats are
only selective if the data is clustered on the filter column — an
unsorted write scatters every value range across every file and the
stats prune nothing.

``write_sorted`` lays a table out as range-partitioned, sorted files:
``repartitionByRange`` splits rows into contiguous key ranges (one
range per output file, via a distributed sample of the key
distribution) and ``sortWithinPartitions`` orders rows inside each, so
both file-level and row-group-level min/max stats become tight,
non-overlapping intervals. A range predicate on the layout key then
reads ~(selectivity × files) instead of all of them.

This is single-dimension clustering — the right default for the
dominant filter column (event time, effective_date, opco_id). For
genuinely multi-dimensional filter sets, interleave bits of the key
columns into a Z-value and sort by that instead (same write path,
``zorder_col`` helper); at two or three dims it preserves useful
locality on each.

The skipping is measurable, not aspirational: tests assert the scan's
row-count metric drops under a range filter on the sorted layout vs the
unsorted one (tests/test_layout.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` range-partitioned files, each sorted
    on ``sort_cols`` — tight per-file and per-row-group min/max stats
    on the leading sort column.

    Size ``n_files`` as total_bytes / target_file_bytes (cf.
    ``compaction.compact_partitioned``); at very large scale run this
    per hive-partition so the range sample stays local.
    """
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def zorder_col(cols: list[str], bits: int = 21) -> Column:
    """Z-value (Morton code) of up to 3 integer columns: interleaves the
    low ``bits`` bits of each so a sort on the result clusters all
    dimensions at once. Columns must be non-negative integers (rank or
    bucketize first for other types; NULLs sort first via coalesce-to-0).

    bits=21 keeps 3 dims × 21 bits = 63 bits inside a bigint.
    """
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder_col supports 1-3 columns")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(
                F.coalesce(F.col(c), F.lit(0)).cast("bigint"), b
            ).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * len(cols) + i)
    return z
