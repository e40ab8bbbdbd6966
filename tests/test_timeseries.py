"""resample_ffill: dense grid, forward fill, per-bucket mean, grid guard."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.timeseries import (
    resample_ffill,
)


def _events(spark, rows):
    df = spark.createDataFrame(rows, "k string, sec bigint, value double")
    return df, F.timestamp_seconds(F.col("sec"))


def test_resample_fills_gaps_and_averages(spark):
    # key a: buckets 10, 13 (gap 11, 12); bucket 10 has two events
    rows = [
        ("a", 10 * 60 + 5, 1.0), ("a", 10 * 60 + 30, 3.0),
        ("a", 13 * 60 + 1, 7.0),
        ("b", 5 * 60, 5.0),
        ("c", 20, None),  # null value dropped
        (None, 30, 1.0),  # null key dropped
    ]
    df, ts = _events(spark, rows)
    out = {
        (r["k"], r["bucket"]): (r["v_ffill"], r["filled"])
        for r in resample_ffill(df, "k", ts, "value", interval_sec=60).collect()
    }
    assert out[("a", 10)] == (2.0, False)   # mean of the two events
    assert out[("a", 11)] == (2.0, True)    # gap forward-filled
    assert out[("a", 12)] == (2.0, True)
    assert out[("a", 13)] == (7.0, False)
    assert out[("b", 5)] == (5.0, False)
    assert len(out) == 5  # c and the NULL key emit nothing


def test_resample_guard_on_stray_epoch(spark):
    rows = [("a", 0, 1.0), ("a", 400_000 * 60, 2.0)]  # 400k one-minute buckets
    df, ts = _events(spark, rows)
    with pytest.raises(ValueError, match="dense grid"):
        resample_ffill(df, "k", ts, "value", interval_sec=60)
    # explicit override builds it
    n = resample_ffill(
        df, "k", ts, "value", interval_sec=60, max_buckets_per_key=500_000
    ).count()
    assert n == 400_001
    with pytest.raises(ValueError):
        resample_ffill(df, "k", ts, "value", interval_sec=0)


def test_ewma_fixed_point_hand_computed(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.timeseries import (
        ewma_last,
    )

    # alpha=3/10, scale=2: s0=100 (1.00); s1=(2*(3*200+7*100)+10)//20=130
    # (1.30); s2=(2*(3*50+7*130)+10)//20=106 (1.06)
    df = spark.createDataFrame(
        [(1, 0, 1.00), (1, 1, 2.00), (1, 2, 0.50), (2, 0, 4.25)],
        "k BIGINT, o BIGINT, v DOUBLE",
    )
    out = {r["k"]: r for r in ewma_last(df, "k", "o", "v").collect()}
    assert out[1]["n_points"] == 3 and out[1]["ewma"] == 1.06
    assert out[2]["ewma"] == 4.25  # single point = itself
    # order matters: reversing the order column changes the result
    df_rev = spark.createDataFrame(
        [(1, 2, 1.00), (1, 1, 2.00), (1, 0, 0.50)],
        "k BIGINT, o BIGINT, v DOUBLE",
    )
    r = ewma_last(df_rev, "k", "o", "v").collect()[0]
    assert r["ewma"] != 1.06
    import pytest as _pt

    with _pt.raises(ValueError):
        ewma_last(df, "k", "o", "v", alpha_num=11, alpha_den=10)


def test_ewma_negative_value_raises(spark):
    """The fixed-point fold's domain is non-negative values: a negative
    input must RAISE (Spark truncate-toward-zero vs DuckDB floor
    diverge there, and scaled -1 would collide with the no-state
    sentinel), never silently fold."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException, SparkRuntimeException

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.timeseries import (
        ewma_last,
    )

    df = spark.createDataFrame(
        [(1, 0, 1.00), (1, 1, -0.01)], "k BIGINT, o BIGINT, v DOUBLE"
    )
    with pytest.raises(
        (Py4JJavaError, PythonException, SparkRuntimeException),
        match="negative value",
    ):
        ewma_last(df, "k", "o", "v").collect()
