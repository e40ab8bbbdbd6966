"""Streaming drift monitor: per-batch profiles, replay idempotency, and
the two univariate drift flags (null ratio, mean shift)."""

import shutil
import tempfile

import pytest

from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.drift import (
    DriftMonitor,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="drift-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, s string, v double")


def test_drift_flags(spark, root):
    mon = DriftMonitor(
        spark, root, columns=["k", "s", "v"], numeric_columns=["v"]
    )
    # baseline: no nulls, mean 10, sd ~1
    b0 = _mk(spark, [(i, "x", 10.0 + (i % 3) - 1) for i in range(60)])
    mon.record_batch(b0, 0)
    # drifted: 25% nulls in s, mean of v jumps by ~5 sds
    b1 = _mk(
        spark,
        [(i, None if i % 4 == 0 else "x", 15.0 + (i % 3) - 1) for i in range(60)],
    )
    mon.record_batch(b1, 1)

    rep = {r["col_name"]: r for r in mon.drift_report(0, 1).collect()}
    assert rep["s"]["null_drift"] is True
    assert rep["s"]["null_ratio_delta"] == 0.25
    assert rep["k"]["null_drift"] is False
    assert rep["v"]["mean_drift"] is True and rep["v"]["mean_shift_sds"] > 3
    # string column has no numeric profile: mean flag stays false
    assert rep["s"]["mean_drift"] is False and rep["s"]["mean_shift_sds"] is None
    # no-drift comparison of a batch against itself
    same = {r["col_name"]: r for r in mon.drift_report(1, 1).collect()}
    assert all(not r["null_drift"] and not r["mean_drift"] for r in same.values())


def test_drift_replay_idempotent(spark, root):
    mon = DriftMonitor(spark, root, columns=["k"], numeric_columns=[])
    b0 = _mk(spark, [(1, "x", 1.0)])
    mon.record_batch(b0, 0)
    mon.record_batch(b0, 0)  # replayed batch overwrites its own dir
    hist = mon.profiles()
    assert hist.count() == 1  # one profile row (one column), not two
    assert hist.first()["batch_id"] == 0
