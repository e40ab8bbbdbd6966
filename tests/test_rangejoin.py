"""Range-join operator tests: bucketed-bin equi-join must match the naive
inequality join exactly."""

import datetime as dt
import random

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.rangejoin import (
    range_count,
    range_join,
)


def _mk(spark, rows, ts_name):
    return spark.createDataFrame(
        rows, f"k string, {ts_name} timestamp, id int"
    )


def test_range_join_matches_naive(spark):
    base = dt.datetime(2024, 1, 1)
    rnd = random.Random(7)
    left = _mk(spark, [("A", base + dt.timedelta(seconds=rnd.randint(0, 3600)), i)
                       for i in range(40)], "lts")
    right = _mk(spark, [("A", base + dt.timedelta(seconds=rnd.randint(0, 3600)), 100 + i)
                        for i in range(40)], "rts").withColumnRenamed("id", "rid")
    lo, hi = -300.0, 120.0

    got = {(r["id"], r["rid"]) for r in
           range_join(left, right.select("k", "rts", "rid"),
                      "k", "lts", "rts", lo, hi).collect()}
    naive = {(r["id"], r["rid"]) for r in
             left.join(right.select(F.col("k").alias("k2"), "rts", "rid"),
                       (F.col("k") == F.col("k2"))
                       & (F.unix_micros("rts") >= F.unix_micros("lts") + int(lo * 1e6))
                       & (F.unix_micros("rts") <= F.unix_micros("lts") + int(hi * 1e6))
                       ).collect()}
    assert got == naive and len(got) > 0


def test_range_join_no_cross_key_matches(spark):
    base = dt.datetime(2024, 1, 1)
    left = _mk(spark, [("A", base, 1)], "lts")
    right = _mk(spark, [("B", base, 2)], "rts").withColumnRenamed("id", "rid")
    assert range_join(left, right.select("k", "rts", "rid"),
                      "k", "lts", "rts", -60, 60).count() == 0


def test_range_count_includes_zero_matches(spark):
    base = dt.datetime(2024, 1, 1)
    left = _mk(spark, [("A", base, 1), ("A", base + dt.timedelta(hours=5), 2)], "lts")
    right = _mk(spark, [("A", base + dt.timedelta(seconds=30), 10)], "rts")
    out = {r["id"]: r["n_in_range"] for r in
           range_count(left, right.select("k", F.col("rts")),
                       "k", "lts", "rts", 0, 60).collect()}
    assert out == {1: 1, 2: 0}
