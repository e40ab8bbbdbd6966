"""Skew-handling + compaction tests (SURVEY.md §7.1 M7)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
    salted_aggregate,
    salted_replicate_join,
    with_salt,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.compaction import (
    compact_partitioned,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="skew-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_salt_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame([("k", i) for i in range(100)], ["k", "v"])
    s1 = [r["__salt"] for r in with_salt(df, 8).orderBy("v").collect()]
    s2 = [r["__salt"] for r in with_salt(df, 8).orderBy("v").collect()]
    assert s1 == s2  # deterministic under re-execution
    assert all(0 <= s < 8 for s in s1)
    assert len(set(s1)) > 1  # actually spreads


def test_salted_aggregate_matches_plain(spark):
    # one hot key (90% of rows) + long tail
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        (r["k"]): (r["n"], round(r["s"], 6))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], round(r["s"], 6))
        for r in salted_aggregate(
            df,
            ["k"],
            [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
        ).collect()
    }
    assert salted == plain


def test_salted_replicate_join_matches_plain(spark):
    facts = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(10)],
        ["k", "v"],
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "label"])
    plain = sorted(
        (r["k"], r["v"], r["label"]) for r in facts.join(dim, "k", "left").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_replicate_join(facts, dim, "k").collect()
    )
    assert salted == plain


def test_compact_partitioned(spark, tmpdir):
    path = f"{tmpdir}/data"
    # create a fragmented dataset: 10 appends x 2 partitions
    for i in range(10):
        spark.createDataFrame(
            [("a", i, float(i)), ("b", i, float(i))], ["part", "k", "v"]
        ).coalesce(1).write.partitionBy("part").mode("append").parquet(path)
    before = spark.read.parquet(path)
    n_before = before.count()
    res = compact_partitioned(spark, path, "part", target_file_bytes=1 << 30)
    assert res["files_before"] >= 20
    assert res["files_after"] < res["files_before"]
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert sorted(after.columns) == sorted(before.columns)


def _hot_inputs(spark):
    # one 90%-hot key + tail on the left; right shares the skew
    left = spark.createDataFrame(
        [(7, i, float(i)) for i in range(450)]
        + [(k, k * 10, float(k)) for k in range(20)]
        + [(None, 999, 0.0)],
        ["k", "lv", "lw"],
    )
    right = spark.createDataFrame(
        [(7, i) for i in range(40)]
        + [(k, k * 100) for k in range(0, 20, 2)]
        + [(None, -1)],
        ["k", "rv"],
    )
    return left, right


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_hot_split_join_identity_with_census_derived_hot_keys(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
        hot_split_join,
    )

    left, right = _hot_inputs(spark)
    plain = left.join(right, "k", "inner")
    out = hot_split_join(left, right, "k", hot_num=1, hot_den=10)
    assert out.columns == plain.columns
    assert _rows(out) == _rows(plain)


def test_hot_split_join_identity_with_explicit_and_df_hot_keys(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
        hot_split_join,
    )

    left, right = _hot_inputs(spark)
    plain = _rows(left.join(right, "k", "inner"))
    # list form (ints — stringified internally), incl. a key absent on
    # the right and a None that must be ignored
    assert _rows(hot_split_join(left, right, "k", hot_keys=[7, 3, None])) == plain
    # DataFrame form
    hk = spark.createDataFrame([(7,), (2,)], ["key"])
    assert _rows(hot_split_join(left, right, "k", hot_keys=hk)) == plain


def test_hot_split_join_empty_hot_set_degenerates_to_plain(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
        hot_split_join,
    )

    left, right = _hot_inputs(spark)
    plain = _rows(left.join(right, "k", "inner"))
    assert _rows(hot_split_join(left, right, "k", hot_keys=[])) == plain
    # census with an unreachable hotness threshold -> no hot keys
    assert _rows(
        hot_split_join(left, right, "k", hot_num=99, hot_den=1)
    ) == plain


def test_hot_split_join_rejects_outer_joins(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
        hot_split_join,
    )

    left, right = _hot_inputs(spark)
    with pytest.raises(ValueError, match="inner"):
        hot_split_join(left, right, "k", how="left")


def test_hot_split_join_caps_hot_list(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
        hot_split_join,
    )

    left, right = _hot_inputs(spark)
    with pytest.raises(ValueError, match="max_hot_keys"):
        hot_split_join(left, right, "k", hot_keys=list(range(300)))
    # explicit raise works
    out = hot_split_join(
        left, right, "k", hot_keys=list(range(300)), max_hot_keys=512
    )
    assert _rows(out) == _rows(left.join(right, "k", "inner"))
