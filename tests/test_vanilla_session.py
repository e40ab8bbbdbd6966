"""The driver contract must work in ANY caller-provided SparkSession —
regression guard for the runtime-conf enforcement in __spark_entry__."""

import subprocess
import sys

SCRIPT = r"""
from pyspark.sql import SparkSession
import __spark_entry__ as m
spark = SparkSession.builder.master("local[4]").appName("vanilla").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
assert len(m.entry(spark).collect()) > 0
# the nanos-parquet events table is the config-sensitive one
assert m.queries()["events_sessionize"](spark, "/root/testdata/sf0.001").count() > 0
# newest driver-window queries must also run under a vanilla session
assert m.queries()["gopher_quality_flags"](spark, "/root/testdata/sf0.001").count() > 0
assert m.queries()["corpus_report"](spark, "/root/testdata/sf0.001").count() > 0
assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
print("VANILLA-OK")
"""


def test_contract_under_vanilla_session():
    # separate process: must not inherit the test session's configs
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "VANILLA-OK" in out.stdout, out.stderr[-2000:]
