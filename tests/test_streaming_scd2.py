"""Streaming SCD2 dimension maintenance: end-to-end drain, restart
continuation, replay idempotency, version pruning."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.incremental import (
    read_file_stream,
    run_incremental,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.scd2_stream import (
    Scd2DimStream,
)

SCHEMA = "k int, st string, effective_ts bigint"


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="scd2s-")
    os.makedirs(f"{d}/in")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_updates(spark, path, rows):
    # the file source wants FLAT files; spark writes a directory, so
    # stage and move the single part file to the watched path
    import glob

    stage = f"{path}__stage"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.move(part, path)
    shutil.rmtree(stage, ignore_errors=True)


def _drain(spark, dirs, dim):
    stream = read_file_stream(spark, f"{dirs}/in", spark.createDataFrame(
        [], SCHEMA).schema)
    q = run_incremental(
        stream, dim.batch_fn(), f"{dirs}/ckpt", available_now=True
    )
    q.awaitTermination(120)


def test_streaming_scd2_lifecycle(spark, dirs):
    dim = Scd2DimStream(
        spark, f"{dirs}/dim", keys=["k"], tracked_cols=["st"],
        keep_versions=2,
    )
    _write_updates(spark, f"{dirs}/in/b0.parquet", [(1, "A", 10), (2, "B", 10)])
    _drain(spark, dirs, dim)
    cur = {(r["k"], r["st"], r["valid_from"], r["valid_to"])
           for r in dim.current().collect()}
    assert cur == {(1, "A", 10, None), (2, "B", 10, None)}

    # second arrival: key 1 changes, key 3 appears; duplicate rows for
    # key 1 collapse to the latest (ts 21 wins over 20)
    _write_updates(
        spark, f"{dirs}/in/b1.parquet",
        [(1, "A1", 20), (1, "A2", 21), (3, "C", 20)],
    )
    _drain(spark, dirs, dim)
    cur = {(r["k"], r["st"], r["valid_from"], r["valid_to"])
           for r in dim.current().collect()}
    assert cur == {
        (1, "A", 10, 21), (1, "A2", 21, None),   # closed + reopened
        (2, "B", 10, None),                       # untouched
        (3, "C", 20, None),                       # inserted
    }

    # restart with the SAME checkpoint: nothing new -> no new version
    before = dim._versions()
    _drain(spark, dirs, dim)
    assert dim._versions() == before

    # third arrival after restart continues the history
    _write_updates(spark, f"{dirs}/in/b2.parquet", [(2, "B9", 30)])
    _drain(spark, dirs, dim)
    cur = {(r["k"], r["st"], r["valid_to"]) for r in dim.current().collect()}
    assert (2, "B", 30) in cur and (2, "B9", None) in cur
    # pruning: keep_versions=2 bounds the version list
    assert len(dim._versions()) <= 2


def test_streaming_scd2_replay_is_noop(spark, dirs):
    dim = Scd2DimStream(spark, f"{dirs}/dim", keys=["k"], tracked_cols=["st"])
    b0 = spark.createDataFrame([(1, "A", 10)], SCHEMA)
    assert dim.apply_batch(b0, 0) is True
    snap = sorted(tuple(r) for r in dim.current().collect())
    # redelivery of the same batch id: skipped, dimension unchanged
    assert dim.apply_batch(b0, 0) is False
    assert sorted(tuple(r) for r in dim.current().collect()) == snap
    # an older batch id than the newest version is also skipped
    b1 = spark.createDataFrame([(1, "A1", 20)], SCHEMA)
    assert dim.apply_batch(b1, 1) is True
    assert dim.apply_batch(b0, 0) is False


def test_streaming_scd2_timestamp_ts_col(spark, dirs):
    """Regression (round-6 ADVICE): _empty_current previously hard-coded
    bigint validity columns, so a timestamp-typed ts_col failed at plan
    time on the FIRST micro-batch (scd2_apply builds structs mixing the
    empty dimension's valid_from with the update's __uts). The validity
    types must derive from ts_col's own type."""
    import datetime as dt

    schema = "k int, st string, effective_ts timestamp"
    dim = Scd2DimStream(
        spark, f"{dirs}/dim_ts", keys=["k"], tracked_cols=["st"]
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 2, 1, 0, 0, 0)
    assert dim.apply_batch(
        spark.createDataFrame([(1, "A", t0), (2, "B", t0)], schema), 0
    ) is True
    assert dim.apply_batch(
        spark.createDataFrame([(1, "A2", t1)], schema), 1
    ) is True
    cur = dim.current()
    assert dict(cur.dtypes)["valid_from"].startswith("timestamp")
    rows = {
        (r["k"], r["st"], r["valid_from"], r["valid_to"])
        for r in cur.collect()
    }
    assert (1, "A", t0, t1) in rows       # closed old version
    assert (1, "A2", t1, None) in rows    # reopened
    assert (2, "B", t0, None) in rows     # untouched open row
