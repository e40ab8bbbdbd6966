"""RunLedger runtime tests: admission, idempotent status, dual-write set,
notifier hooks (SURVEY.md §2.9 O2/O5/O8)."""

import shutil
import tempfile

import pytest

from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans.run_ledger import RunLedger


@pytest.fixture()
def ledger_path():
    d = tempfile.mkdtemp(prefix="ledger-")
    yield f"{d}/ledger"
    shutil.rmtree(d, ignore_errors=True)


def test_admission_fifo(spark, ledger_path):
    lg = RunLedger(spark, ledger_path)
    lg.record("f1", "t1", "e1", "RUNNING")
    lg.record("f2", "t2", "e2", "RUNNING")
    lg.record("f3", "t3", "e3", "RUNNING")
    assert lg.admit("e1", max_concurrency=2) is True
    assert lg.admit("e2", max_concurrency=2) is True
    assert lg.admit("e3", max_concurrency=2) is False
    # e1 finishes → e3 admitted
    lg.record("f1", "t1", "e1", "SUCCEEDED")
    assert lg.admit("e3", max_concurrency=2) is True


def test_idempotent_status_latest_wins(spark, ledger_path):
    lg = RunLedger(spark, ledger_path)
    lg.record("f1", "t1", "e1", "RUNNING")
    lg.record("f1", "t1", "e1", "SUCCEEDED", total_count=100, valid_count=90,
              invalid_count=10)
    cur = lg.current().collect()
    assert len(cur) == 1
    assert cur[0]["status"] == "SUCCEEDED" and cur[0]["invalid_count"] == 10


def test_full_export_opcos_dual_write_set(spark, ledger_path):
    lg = RunLedger(spark, ledger_path)
    lg.record("full1", "t1", "e1", "RUNNING", file_type="full",
              received_opcos="019,020")
    lg.record("full2", "t2", "e2", "RUNNING", file_type="full",
              received_opcos="021")
    lg.record("full3", "t3", "e3", "SUCCEEDED", file_type="full",
              received_opcos="099")  # finished → excluded
    assert lg.full_export_opcos() == {"019", "020", "021"}


def test_notifier_hook(spark, ledger_path):
    events = []
    lg = RunLedger(spark, ledger_path, notifiers=[events.append])
    lg.record("f1", "t1", "e1", "RUNNING")
    lg.record("f1", "t1", "e1", "FAILED", invalid_count=5)
    assert [e["status"] for e in events] == ["RUNNING", "FAILED"]
    assert events[1]["invalid_count"] == 5
