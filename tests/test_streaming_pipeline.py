"""Streaming price_zone pipeline: per-file incremental runs with
exactly-once file processing (SURVEY.md §7.1 M5)."""

import shutil
import tempfile

import pytest

from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans.run_ledger import RunLedger
from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans.streaming_pipeline import (
    run_price_zone_stream,
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="streampipe-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


HEADER = "co_nbr,supc,prc_zone,cust_nbr,eff_from_dttm\n"


def _drop_file(path, i, rows):
    with open(f"{path}/file{i}.csv", "w") as f:
        f.write(HEADER + "".join(rows))


def test_streaming_pipeline_processes_files_exactly_once(spark, workdir):
    import os

    inp = f"{workdir}/in"
    eng = f"{workdir}/eng"
    os.makedirs(inp)
    _drop_file(inp, 1, [
        "019,104612,5,1234567,2020-08-06 00:00:00\n",
        "020,104613,9,1234568,2020-08-06 00:00:00\n",  # pz 9 → 020 quarantined
    ])

    q, res = run_price_zone_stream(spark, inp, eng, active_opcos=["019", "020"])
    q.awaitTermination(180)
    assert len(res.batches) == 1
    assert res.batches[0]["total"] == 2 and res.batches[0]["valid"] == 1

    clean = spark.read.parquet(f"{eng}/clean")
    assert clean.count() == 1
    assert clean.first()["opco_id"] == "019"

    # a new file arrives → only IT is processed (checkpointed source)
    _drop_file(inp, 2, ["021,104614,3,1234569,2020-08-07 00:00:00\n"])
    q, res = run_price_zone_stream(spark, inp, eng, active_opcos=["019", "020", "021"])
    q.awaitTermination(180)
    assert len(res.batches) == 1
    assert res.batches[0]["total"] == 1 and res.batches[0]["valid"] == 1
    assert spark.read.parquet(f"{eng}/clean").count() == 2

    # ledger has one SUCCEEDED record per micro-batch run
    lg = RunLedger(spark, f"{eng}/ledger")
    assert lg.events().filter("status = 'SUCCEEDED'").count() == 2
