"""Sort-clustered layout (sources/layout.py): tight non-overlapping
file stats, pushed range filters, data fidelity, and z-value interleave."""

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.layout import (
    write_sorted,
    zorder_col,
)


def _file_ranges(path, col):
    """(min, max) of ``col`` per parquet file, from footer stats only."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_idx = md.schema.to_arrow_schema().get_field_index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(schema_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_write_sorted_produces_disjoint_file_ranges(spark, tmpdir):
    df = spark.range(100_000).select(
        (F.xxhash64("id") % 1_000_000).alias("k"),
        F.col("id").alias("payload"),
    )
    path = f"{tmpdir}/sorted"
    write_sorted(df, path, ["k"], n_files=8)

    ranges = _file_ranges(path, "k")
    assert len(ranges) == 8
    # range partitioning + in-file sort ⇒ file intervals don't overlap
    for (_, hi), (lo, _) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert hi <= lo
    # a narrow range predicate matches few files by stats alone
    lo_q, hi_q = -1000, 1000
    matching = [r for r in ranges if not (r[1] < lo_q or r[0] > hi_q)]
    assert len(matching) <= 2

    # data fidelity + filter pushdown reaches the scan
    back = spark.read.parquet(path)
    assert back.count() == 100_000
    q = back.filter((F.col("k") >= lo_q) & (F.col("k") <= hi_q))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k" in plan


def test_unsorted_layout_has_overlapping_ranges(spark, tmpdir):
    """Control: the same data written unsorted gives useless stats —
    every file spans ~the whole key domain."""
    df = spark.range(100_000).select(
        (F.xxhash64("id") % 1_000_000).alias("k"),
        F.col("id").alias("payload"),
    )
    path = f"{tmpdir}/unsorted"
    df.repartition(8).write.parquet(path)
    ranges = _file_ranges(path, "k")
    lo_q, hi_q = -1000, 1000
    matching = [r for r in ranges if not (r[1] < lo_q or r[0] > hi_q)]
    assert len(matching) == 8  # no file can be skipped


def test_zorder_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3)], "x INT, y INT"
    )
    got = [
        r["z"]
        for r in df.select(zorder_col(["x", "y"], bits=8).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    # orderBy(x,y) rows: (0,0)(0,1)(0,2)(1,0)(1,1)(2,0)(3,3)
    assert got == [0, 2, 8, 1, 3, 4, 15]


def test_zorder_validation(spark):
    with pytest.raises(ValueError):
        zorder_col([])
    with pytest.raises(ValueError):
        zorder_col(["a", "b", "c", "d"])
    with pytest.raises(ValueError):
        zorder_col(["a", "b"], bits=32)


def test_write_sorted_zorder_path(spark, tmpdir):
    """Z-ordered write clusters BOTH dims: most files' stats cover a
    strict sub-range of each dimension (a single-column sort would give
    full-domain spans on the other column in EVERY file). Files whose
    z-interval crosses a high-bit flip legitimately span a whole dim —
    range boundaries are sample-based, not bit-aligned — so the
    assertion is on the majority, not all."""
    df = spark.createDataFrame(
        [(i // 64, i % 64) for i in range(4096)], "x INT, y INT"
    ).withColumn("z", zorder_col(["x", "y"], bits=6))
    path = f"{tmpdir}/zsorted"
    write_sorted(df, path, ["z"], n_files=8)
    for col in ("x", "y"):
        ranges = _file_ranges(path, col)
        spans = [hi - lo for lo, hi in ranges]
        assert sum(1 for s in spans if s <= 48) >= 5, (col, spans)