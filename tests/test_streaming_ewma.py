"""Streaming per-key EWMA state (streaming/ewma_state.py): streaming ≡
batch parity, delta snapshots with latest-wins reads, replay
idempotency, end-to-end stream."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.timeseries import (
    ewma_last,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.ewma_state import (
    make_ewma_batch_fn,
    read_ewma,
    streaming_ewma,
)

SCHEMA = "k BIGINT, o BIGINT, v DOUBLE"


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="ewmastate-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


B1 = [(1, 0, 1.00), (1, 1, 2.00), (2, 0, 4.25)]
B2 = [(1, 2, 0.50), (3, 0, 7.00)]
B3 = [(2, 1, 1.75), (1, 3, 9.99)]


def test_streaming_equals_batch_fold(spark, workdir):
    fn = make_ewma_batch_fn(workdir, "k", "o", "v")
    for i, b in enumerate((B1, B2, B3)):
        fn(spark.createDataFrame(b, SCHEMA), i)
    got = sorted(map(tuple, read_ewma(spark, workdir, "k").collect()))
    want = sorted(
        map(
            tuple,
            ewma_last(
                spark.createDataFrame(B1 + B2 + B3, SCHEMA), "k", "o", "v"
            ).select("k", "n_points", "ewma").collect(),
        )
    )
    assert got == want
    # delta snapshots: epoch 1 only wrote keys 1 and 3
    ep1 = spark.read.parquet(f"{workdir}/ewma/batch_id=1")
    assert sorted(r["k"] for r in ep1.collect()) == [1, 3]


def test_replay_is_noop(spark, workdir):
    fn = make_ewma_batch_fn(workdir, "k", "o", "v")
    fn(spark.createDataFrame(B1, SCHEMA), 0)
    fn(spark.createDataFrame(B2, SCHEMA), 1)
    before = sorted(map(tuple, read_ewma(spark, workdir, "k").collect()))
    fn(spark.createDataFrame(B2, SCHEMA), 1)  # replay epoch 1
    after = sorted(map(tuple, read_ewma(spark, workdir, "k").collect()))
    assert before == after


def test_empty_state_read(spark, workdir):
    out = read_ewma(spark, workdir, "k")
    assert out.count() == 0
    assert out.columns == ["k", "n_points", "ewma"]


def test_streaming_end_to_end(spark, workdir):
    src = f"{workdir}/src"
    spark.createDataFrame(B1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(B2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_ewma(stream, workdir, "k", "o", "v")
    q.awaitTermination(120)
    got = sorted(map(tuple, read_ewma(spark, workdir, "k").collect()))
    want = sorted(
        map(
            tuple,
            ewma_last(
                spark.createDataFrame(B1 + B2, SCHEMA), "k", "o", "v"
            ).select("k", "n_points", "ewma").collect(),
        )
    )
    assert got == want


def test_compact_ewma_state_preserves_reads(spark, workdir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.ewma_state import (
        compact_ewma_state,
    )

    fn = make_ewma_batch_fn(workdir, "k", "o", "v")
    for i, b in enumerate((B1, B2, B3)):
        fn(spark.createDataFrame(b, SCHEMA), i)
    before = sorted(map(tuple, read_ewma(spark, workdir, "k").collect()))
    n_before, n_after = compact_ewma_state(spark, workdir, "k", upto_batch=3)
    assert n_before >= n_after  # key 1 had 3 delta rows -> 1
    after = sorted(map(tuple, read_ewma(spark, workdir, "k").collect()))
    assert before == after
    import os

    dirs = [d for d in os.listdir(f"{workdir}/ewma")
            if d.startswith("batch_id=")]
    assert dirs == ["batch_id=2"]
    # a later batch still folds onto the compacted state correctly
    fn(spark.createDataFrame([(1, 9, 3.33)], SCHEMA), 3)
    got = sorted(map(tuple, read_ewma(spark, workdir, "k").collect()))
    want = sorted(
        map(
            tuple,
            ewma_last(
                spark.createDataFrame(
                    B1 + B2 + B3 + [(1, 9, 3.33)], SCHEMA
                ),
                "k", "o", "v",
            ).select("k", "n_points", "ewma").collect(),
        )
    )
    assert got == want


def test_read_ewma_empty_state_key_type(spark, workdir):
    """Before the first commit the empty frame's key dtype must match
    the stream's key column type — a STRING-keyed stream must not get
    a BIGINT key (downstream unions/joins would fail or silently
    cast)."""
    out = read_ewma(spark, workdir, "k", key_type="STRING")
    assert out.count() == 0
    assert dict(out.dtypes)["k"] == "string"
    # default stays BIGINT for the established bigint-keyed streams
    assert dict(read_ewma(spark, workdir, "k").dtypes)["k"] == "bigint"
