"""Data-profiling operators: per-column quality counts, numeric drift
summary, equi-width histogram — single-pass plans, oracle-mirrored
bucket arithmetic."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    profiling as P,
)


def _df(spark):
    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, None, 30.0),
        (4, "b", None), (4, "b", 40.0),
    ]
    return spark.createDataFrame(rows, ["k", "s", "v"])


def test_profile_table_counts(spark):
    out = {
        r["col_name"]: (r["n_rows"], r["n_null"], r["n_distinct"])
        for r in P.profile_table(_df(spark)).collect()
    }
    assert out == {
        "k": (5, 0, 4),
        "s": (5, 1, 2),   # NULL excluded from distinct
        "v": (5, 1, 4),
    }
    with pytest.raises(ValueError, match="unknown columns"):
        P.profile_table(_df(spark), ["nope"])


def test_profile_table_approx_flag(spark):
    out = {
        r["col_name"]: r["n_distinct"]
        for r in P.profile_table(_df(spark), exact_distinct=False).collect()
    }
    # HLL on 5 values is exact in practice; the contract is the flag runs
    assert out["k"] in (3, 4, 5)


def test_profile_single_job(spark):
    # the whole profile (nulls + distincts for every column) is ONE
    # aggregate pass over the input — pinned via plan scan count
    plan = P.profile_table(_df(spark))
    ex = plan._jdf.queryExecution().executedPlan().toString()
    assert ex.count("Scan ExistingRDD") <= 1


def test_numeric_profile_values(spark):
    import statistics

    out = {
        r["col_name"]: r
        for r in P.numeric_profile(_df(spark), ["v"]).collect()
    }
    v = out["v"]
    vals = [10.0, 20.0, 30.0, 40.0]
    assert v["min_val"] == 10.0 and v["max_val"] == 40.0
    assert v["mean_val"] == 25.0
    assert v["stddev_val"] == round(statistics.stdev(vals), 6)


def test_histogram_edges_and_degenerate(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(11)], ["x"]
    )  # 0..10
    out = {
        r["bucket"]: (r["lo"], r["hi"], r["n"])
        for r in P.equi_width_histogram(df, "x", n_buckets=5).collect()
    }
    # width 2: buckets [0,2),[2,4),... and x=10 (the max) joins the last
    assert out[0] == (0.0, 2.0, 2) and out[4] == (8.0, 10.0, 3)
    assert sum(n for _, _, n in out.values()) == 11
    # explicit bounds: values outside [lo, hi] clamp into the edge buckets
    outb = {
        r["bucket"]: r["n"]
        for r in P.equi_width_histogram(
            df, "x", n_buckets=2, lo=4.0, hi=6.0
        ).collect()
    }
    assert sum(outb.values()) == 11
    assert set(outb) == {0, 1}  # clamped, never negative/overflow buckets
    # degenerate range: everything in bucket 0
    one = spark.createDataFrame([(7.0,), (7.0,)], ["x"])
    d = P.equi_width_histogram(one, "x", n_buckets=4).collect()
    assert len(d) == 1 and d[0]["bucket"] == 0 and d[0]["n"] == 2
    with pytest.raises(ValueError):
        P.equi_width_histogram(df, "x", n_buckets=0)


def test_equi_depth_histogram_balanced_counts(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    out = {r["bucket"]: (r["lo"], r["hi"], r["n"])
           for r in P.equi_depth_histogram(df, "x", n_buckets=4).collect()}
    # uniform data: ~equal depths, ordered disjoint ranges
    assert sorted(out) == [0, 1, 2, 3]
    assert [out[b][2] for b in sorted(out)] == [25, 25, 25, 25]
    assert out[0][0] == 0.0 and out[3][1] == 99.0
    # skewed data still splits by depth, not width
    skew = spark.createDataFrame(
        [(0.001 * i,) for i in range(90)] + [(1000.0 + i,) for i in range(10)],
        ["x"],
    )
    d = {r["bucket"]: r["n"]
         for r in P.equi_depth_histogram(skew, "x", n_buckets=5).collect()}
    assert max(d.values()) <= 30  # no width-style 90/10 collapse
    with pytest.raises(ValueError):
        P.equi_depth_histogram(df, "x", n_buckets=1)


def test_key_skew_report_hand_counts(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        profiling as PF,
    )

    rows = [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 2 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k STRING")
    out = {r.rank: r for r in PF.key_skew_report(df, "k", top_n=3).collect()}
    assert len(out) == 3
    r1, r2, r3 = out[1], out[2], out[3]
    assert (r1.key, r1.cnt) == ("a", 6)
    assert (r2.key, r2.cnt) == ("b", 3)
    # NULL keys count like any hot key
    assert r3.key is None and r3.cnt == 2
    assert r1.n_rows == 12 and r1.n_keys == 4
    assert r1.share == 0.5 and r1.cum_share == 0.5
    assert r2.cum_share == 0.75 and r3.cum_share == round(11 / 12, 6)
    # hot at >= 1/10 of 12 rows = cnt >= 1.2 -> all three flagged
    assert r1.is_hot and r2.is_hot and r3.is_hot
    strict = {
        r.rank: r.is_hot
        for r in PF.key_skew_report(df, "k", top_n=3, hot_num=1, hot_den=2).collect()
    }
    assert strict == {1: True, 2: False, 3: False}


def test_key_skew_report_validates(spark):
    import pytest as _pt

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        profiling as PF,
    )

    df = spark.createDataFrame([("a",)], "k STRING")
    with _pt.raises(ValueError):
        PF.key_skew_report(df, "k", top_n=0)
