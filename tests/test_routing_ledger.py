"""Routing joins + run-ledger operator tests (SURVEY.md §2.4-2.6)."""

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import ledger as L
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import routing as R
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.versioning import (
    LoadDecision,
    ValidationPolicy,
    plan_load,
)


def test_route_to_clusters(spark):
    facts = spark.createDataFrame(
        [("019", 1.0), ("020", 2.0), ("999", 3.0)], ["opco_id", "v"]
    )
    dim = spark.createDataFrame(
        [("019", "01"), ("020", "02")], ["opco_id", "cluster_id"]
    )
    out = R.route_to_clusters(facts, dim)
    got = {r["opco_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {"019": "01", "020": "02", "999": "invalid"}


def test_semi_and_anti_joins(spark):
    facts = spark.createDataFrame([("a",), ("b",), ("c",)], ["k"])
    members = spark.createDataFrame([("a",), ("c",)], ["k"])
    assert {r["k"] for r in R.semi_join_members(facts, members, "k").collect()} == {"a", "c"}
    assert {r["k"] for r in R.anti_join_quarantine(facts, members, "k").collect()} == {"b"}


def test_set_difference(spark):
    left = spark.createDataFrame([("018",), ("019",), ("020",)], ["opco_id"])
    right = spark.createDataFrame([("019",)], ["opco_id"])
    assert {r["opco_id"] for r in R.set_difference(left, right, "opco_id").collect()} == {
        "018",
        "020",
    }


def test_admission_rank(spark):
    # reference: rank by start_time, tie-break by execution_id, admit top-k
    runs = spark.createDataFrame(
        [
            ("e3", 100),
            ("e1", 50),
            ("e2", 100),
        ],
        ["execution_id", "start_time"],
    )
    out = {r["execution_id"]: (r["admission_rank"], r["admitted"]) for r in
           L.admission_rank(runs, max_concurrency=2).collect()}
    assert out["e1"] == (1, True)
    assert out["e2"] == (2, True)  # tie at 100 broken by id: e2 < e3
    assert out["e3"] == (3, False)


def test_status_rollup(spark):
    events = spark.createDataFrame(
        [
            ("r1", "019", "SUCCEEDED"),
            ("r1", "020", "FAILED"),
            ("r2", "019", "SUCCEEDED"),
            ("r3", "019", "RUNNING"),
            ("r3", "020", "SUCCEEDED"),
        ],
        ["run_id", "opco_id", "status"],
    )
    got = {r["run_id"]: r for r in L.status_rollup(events).collect()}
    assert got["r1"]["terminal_status"] == "FAILED"
    assert got["r1"]["success_count"] == 1 and got["r1"]["failed_count"] == 1
    assert got["r2"]["terminal_status"] == "SUCCEEDED"
    assert got["r3"]["terminal_status"] == "RUNNING"


def test_idempotent_latest(spark):
    ledger = spark.createDataFrame(
        [
            ("f1", "t1", 1, "RUNNING"),
            ("f1", "t1", 2, "SUCCEEDED"),
            ("f2", "t1", 1, "RUNNING"),
        ],
        ["file_name", "etl_timestamp", "updated_at", "status"],
    )
    out = {(r["file_name"], r["etl_timestamp"]): r["status"] for r in
           L.idempotent_latest(ledger).collect()}
    assert out == {("f1", "t1"): "SUCCEEDED", ("f2", "t1"): "RUNNING"}


def test_plan_load_decision_table():
    """Exact decision tree of find_tables_to_load (load_job.py:304-368)."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.versioning import (
        ETLLoadError,
    )
    import pytest as _pytest

    # full export + FUTURE empty → FUTURE + effective date
    d = plan_load(is_partial=False, future_empty=True)
    assert d == LoadDecision(False, True, True, True, d.reason)
    # partial, FUTURE empty, no full export → ACTIVE only
    d = plan_load(is_partial=True, future_empty=True)
    assert (d.write_active, d.write_future) == (True, False)
    # partial, FUTURE empty, full export in flight for this opco → dual
    d = plan_load(is_partial=True, future_empty=True,
                  full_export_running=True, opco_in_running_export=True)
    assert (d.write_active, d.write_future) == (True, True)
    # partial, FUTURE empty, full export running but opco NOT in it → ACTIVE only
    d = plan_load(is_partial=True, future_empty=True,
                  full_export_running=True, opco_in_running_export=False)
    assert (d.write_active, d.write_future) == (True, False)
    # partial, FUTURE non-empty → dual regardless of exports
    d = plan_load(is_partial=True, future_empty=False)
    assert (d.write_active, d.write_future) == (True, True)
    # full export + FUTURE non-empty → soft-validation knob
    with _pytest.raises(ETLLoadError):
        plan_load(is_partial=False, future_empty=False, policy=ValidationPolicy.FAIL)
    d = plan_load(is_partial=False, future_empty=False, policy=ValidationPolicy.SKIP)
    assert d.proceed and not d.write_future
    d = plan_load(is_partial=False, future_empty=False, policy=ValidationPolicy.FORCE)
    assert d.write_future and not d.record_effective_date
