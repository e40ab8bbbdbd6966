"""Load-bearing plan-shape pins for the composite contract queries
(the PLANS.md audit, frozen as tests so a shuffle/scan regression fails
CI instead of only changing a report row)."""

import re

import __spark_entry__ as entry


def _shape(df):
    qe = df._jdf.queryExecution()
    executed = qe.executedPlan().toString()
    spark = df.sparkSession
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    formatted = qe.explainString(fmt)
    return {
        "scans": formatted.count("Location:"),
        "cartesian": executed.count("CartesianProduct"),
        "python": sum(
            executed.count(op)
            for op in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
            )
        ),
        "exchanges": len(
            re.findall(r"Exchange (?:hash|range)partitioning", executed)
        ),
        "executed": executed,
    }


def _q(spark, sf_dir, name):
    return entry.queries()[name](spark, sf_dir)


def test_cross_source_sweep_is_pair_sized_after_verify(spark, sf_dir):
    """The sweep's per-threshold branches read the MATERIALIZED pair
    frame: zero parquet scans downstream of the checkpoint (one more
    corpus pass per threshold otherwise) and zero Python."""
    s = _shape(_q(spark, sf_dir, "cross_source_dup_sweep"))
    assert s["scans"] == 0, s["executed"]
    assert s["python"] == 0 and s["cartesian"] == 0


def test_cross_source_report_pair_sized_joins_only(spark, sf_dir):
    """Source lookups join the PAIR table (never corpus x corpus): no
    cartesian product, no Python, bounded scan count."""
    s = _shape(_q(spark, sf_dir, "cross_source_dup_report"))
    assert s["cartesian"] == 0 and s["python"] == 0
    assert s["scans"] <= 4, s["scans"]


def test_cascade_census_reads_only_stage_checkpoints(spark, sf_dir):
    """The census aggregates the lazily-checkpointed stage outputs —
    re-running upstream stages would show as parquet scans."""
    s = _shape(_q(spark, sf_dir, "curation_cascade_census"))
    assert s["scans"] == 0, s["executed"]


# (the fused-rewrite single-tokenize pin lives in
# test_exactsubstr_web.py::test_exactsubstr_decon_rewrite_single_corpus_tokenize
# at the position-entries level — the top-level query plan is truncated
# at the localCheckpoint, so it cannot be asserted here)


def test_frame_near_dup_native_and_banded(spark, sf_dir):
    """dHash near-dup: all-native columns (zero Python) and banded
    equi-join candidates (never a cartesian all-pairs)."""
    s = _shape(_q(spark, sf_dir, "frame_near_dup_pairs"))
    assert s["python"] == 0 and s["cartesian"] == 0


def test_c4_query_is_shuffle_free(spark, sf_dir):
    s = _shape(_q(spark, sf_dir, "c4_line_filtered_docs"))
    assert s["exchanges"] == 0, s["executed"]
    assert s["python"] == 0
