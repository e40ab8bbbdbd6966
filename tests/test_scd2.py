"""SCD2 historized merge: every branch (no-op, close+reopen, insert,
passthrough, closed-history immutability) plus the point-in-time view."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.scd2 import (
    scd2_apply,
    scd2_snapshot,
)


def _dim(spark):
    # key 1: open, will change; key 2: open, unchanged; key 3: open,
    # absent from updates; key 9: closed history row (must never move)
    rows = [
        (1, "A", 10.0, 0, None),
        (2, "B", 20.0, 0, None),
        (3, "C", 30.0, 0, None),
        (9, "OLD", 90.0, -50, 0),
    ]
    return spark.createDataFrame(
        rows, "k int, st string, v double, valid_from bigint, valid_to bigint"
    )


def _upd(spark):
    # key 1 changes, key 2 identical (no-op), key 4 is new
    rows = [(1, "A2", 11.0, 100), (2, "B", 20.0, 100), (4, "D", 40.0, 100)]
    return spark.createDataFrame(
        rows, "k int, st string, v double, effective_ts bigint"
    )


def test_scd2_branches(spark):
    out = scd2_apply(
        _dim(spark), _upd(spark), keys=["k"], tracked_cols=["st", "v"]
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted(
        [
            (1, "A", 10.0, 0, 100),     # old version closed at ts
            (1, "A2", 11.0, 100, None),  # new open version
            (2, "B", 20.0, 0, None),     # identical update: no-op
            (3, "C", 30.0, 0, None),     # untouched (absent from updates)
            (4, "D", 40.0, 100, None),   # brand-new key
            (9, "OLD", 90.0, -50, 0),    # closed history immutable
        ]
    )
    # idempotency: re-applying the same snapshot changes nothing
    again = scd2_apply(out, _upd(spark), keys=["k"], tracked_cols=["st", "v"])
    assert sorted(tuple(r) for r in again.collect()) == got


def test_scd2_null_safe_change_detection(spark):
    dim = spark.createDataFrame(
        [(1, None, 0, None)], "k int, st string, valid_from bigint, valid_to bigint"
    )
    upd_same = spark.createDataFrame(
        [(1, None, 5)], "k int, st string, effective_ts bigint"
    )
    out = scd2_apply(dim, upd_same, keys=["k"], tracked_cols=["st"])
    assert [tuple(r) for r in out.collect()] == [(1, None, 0, None)]  # no-op
    upd_diff = spark.createDataFrame(
        [(1, "X", 5)], "k int, st string, effective_ts bigint"
    )
    out2 = sorted(
        (tuple(r) for r in scd2_apply(
            dim, upd_diff, keys=["k"], tracked_cols=["st"]
        ).collect()),
        key=repr,
    )
    assert out2 == sorted([(1, None, 0, 5), (1, "X", 5, None)], key=repr)


def test_scd2_rejects_duplicate_update_keys(spark):
    dup = spark.createDataFrame(
        [(1, "A", 5), (1, "B", 5)], "k int, st string, effective_ts bigint"
    )
    with pytest.raises(ValueError, match="one row per key"):
        scd2_apply(_dim(spark), dup, keys=["k"], tracked_cols=["st"])
    with pytest.raises(ValueError, match="tracked column"):
        scd2_apply(_dim(spark), dup, keys=["k"], tracked_cols=[])
    with pytest.raises(ValueError, match="missing from updates"):
        scd2_apply(
            _dim(spark),
            dup.drop("effective_ts"),
            keys=["k"], tracked_cols=["st"],
        )


def test_scd2_snapshot_point_in_time(spark):
    out = scd2_apply(
        _dim(spark), _upd(spark), keys=["k"], tracked_cols=["st", "v"]
    )
    at_50 = {r["k"]: r["st"] for r in scd2_snapshot(out, 50).collect()}
    assert at_50 == {1: "A", 2: "B", 3: "C"}  # pre-update world, 9 closed
    at_100 = {r["k"]: r["st"] for r in scd2_snapshot(out, 100).collect()}
    assert at_100 == {1: "A2", 2: "B", 3: "C", 4: "D"}
    at_minus10 = {r["k"]: r["st"] for r in scd2_snapshot(out, -10).collect()}
    assert at_minus10 == {9: "OLD"}
