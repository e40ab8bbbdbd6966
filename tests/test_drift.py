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


def test_drift_shape_tests_catch_what_mean_misses(spark, root):
    """Variance collapse at an IDENTICAL mean: the mean-shift flag stays
    false, the KS flag fires. Category mix flip at identical null/count
    profile: PSI fires."""
    mon = DriftMonitor(
        spark, root, columns=["s", "v"], numeric_columns=["v"],
        categorical_columns=["s"], quantile_fracs=19,
    )
    # batch 0: v symmetric wide around 50 (uniform 0..100), s mostly 'a'
    b0 = [(i, "a" if i % 10 else "b", float(i % 101)) for i in range(2000)]
    # batch 1: v CONSTANT 50 (same mean, zero variance), s mostly 'b'
    b1 = [(i, "b" if i % 10 else "a", 50.0) for i in range(2000)]
    mon.record_batch(_mk(spark, b0), 0)
    mon.record_batch(_mk(spark, b1), 1)
    rep = {r["col_name"]: r for r in mon.drift_report(0, 1).collect()}
    # the mean test is blind to both changes...
    assert rep["v"]["mean_drift"] is False
    assert rep["v"]["null_drift"] is False
    # ...the shape tests are not
    assert rep["v"]["ks_drift"] is True and rep["v"]["ks_stat"] > 0.3
    assert rep["s"]["psi_drift"] is True and rep["s"]["psi"] > 0.2
    # self-comparison: all quiet
    same = {r["col_name"]: r for r in mon.drift_report(1, 1).collect()}
    assert all(
        not r["psi_drift"] and not r["ks_drift"] for r in same.values()
    )


def test_psi_shared_category_fold_near_cap(spark, root):
    """ADVICE r6: per-batch independent top-N capping can NAME a
    category in one batch but fold it into __OTHER__ in the other,
    double-counting the shift. With the report-time shared-category
    fold, two batches with IDENTICAL distribution shape (same counts,
    different tail labels beyond the cap) must report PSI == 0."""
    mon = DriftMonitor(
        spark, root, columns=["s"], categorical_columns=["s"],
        max_categories=2,
    )
    # baseline: A:100, B:99, C:1  -> named {A, B}, C folds at record time
    b0 = [(i, "A", 0.0) for i in range(100)] + \
         [(i, "B", 0.0) for i in range(100, 199)] + [(199, "C", 0.0)]
    # current:  A:100, C:99, B:1  -> named {A, C}, B folds at record time
    b1 = [(i, "A", 0.0) for i in range(100)] + \
         [(i, "C", 0.0) for i in range(100, 199)] + [(199, "B", 0.0)]
    mon.record_batch(_mk(spark, b0), 0)
    mon.record_batch(_mk(spark, b1), 1)
    rep = {r["col_name"]: r for r in mon.drift_report(0, 1).collect()}
    # shared named set = {A}; both sides fold B/C/__OTHER__ into
    # __OTHER__ with identical mass -> no shift
    assert rep["s"]["psi"] == 0.0 and rep["s"]["psi_drift"] is False


def test_batch_report_matches_monitor(spark, root):
    """batch_drift_report is the oracle-facing companion: on the same
    two frames it must agree with the monitor's report exactly on
    every profile/PSI statistic and flag; ks_stat may differ only by
    the approx-vs-exact percentile sketch (same grid size, tight)."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.drift import (
        batch_drift_report,
    )

    b0 = _mk(spark, [(i, ["a", "b", None][i % 3],
                      float(i % 50)) for i in range(300)])
    b1 = _mk(spark, [(i, ["a", "a", "c"][i % 3],
                      float(i % 80) + 5.0) for i in range(300)])
    mon = DriftMonitor(
        spark, root, columns=["k", "s", "v"], numeric_columns=["v"],
        categorical_columns=["s"], quantile_fracs=19,
    )
    mon.record_batch(b0, 0)
    mon.record_batch(b1, 1)
    stream = {r["col_name"]: r for r in mon.drift_report(0, 1).collect()}
    batch = {r["col_name"]: r for r in batch_drift_report(
        b0, b1, columns=["k", "s", "v"], numeric_columns=["v"],
        categorical_columns=["s"], quantile_fracs=19,
    ).collect()}
    assert set(stream) == set(batch) == {"k", "s", "v"}
    for c in stream:
        for f in ("null_ratio_delta", "distinct_ratio", "mean_shift_sds",
                  "psi", "null_drift", "mean_drift", "psi_drift"):
            assert stream[c][f] == batch[c][f], (c, f)
    assert batch["v"]["ks_stat"] == pytest.approx(
        stream["v"]["ks_stat"], abs=0.1
    )


def test_drift_psi_other_bucket_and_nulls(spark, root):
    """Category cap: beyond max_categories the tail folds into
    __OTHER__ deterministically; NULL categories count as __NULL__."""
    mon = DriftMonitor(
        spark, root, columns=["s"], categorical_columns=["s"],
        max_categories=2,
    )
    b0 = [(i, ["x", "y", "z", None][i % 4], 0.0) for i in range(400)]
    b1 = [(i, ["x", "x", "x", "w"][i % 4], 0.0) for i in range(400)]
    mon.record_batch(_mk(spark, b0), 0)
    mon.record_batch(_mk(spark, b1), 1)
    cats = {
        (r["batch_id"], r["category"]): r["n"]
        for r in mon.categories().collect()
    }
    # batch 0: 4 categories capped at 2 -> 2 named + __OTHER__ fold
    b0_cats = {c for (b, c) in cats if b == 0}
    assert "__OTHER__" in b0_cats and len(b0_cats) == 3
    assert sum(n for (b, _), n in cats.items() if b == 0) == 400
    rep = {r["col_name"]: r for r in mon.drift_report(0, 1).collect()}
    assert rep["s"]["psi"] is not None and rep["s"]["psi_drift"] is True
