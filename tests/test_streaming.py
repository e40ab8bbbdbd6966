"""Structured-streaming incremental processing tests (SURVEY.md §2.8)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming import incremental as I

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
    ]
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_available_now_drains_files_exactly_once(spark, tmpdir):
    import datetime as dt

    src = f"{tmpdir}/in"
    ckpt = f"{tmpdir}/ckpt"
    t = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(spark, src, [(1, t, 10, "click"), (2, t, 11, "view")])

    seen: list[tuple[int, int]] = []  # (batch_id, row_count)

    def batch_fn(df, batch_id):
        seen.append((batch_id, df.count()))

    stream = I.read_file_stream(spark, src, EVENT_SCHEMA)
    q = I.run_incremental(stream, batch_fn, ckpt)
    q.awaitTermination(120)
    assert sum(n for _, n in seen) == 2

    # second run with NEW file only processes the new file (checkpointed)
    _write_batch(spark, src, [(3, t, 12, "purchase")])
    seen.clear()
    stream = I.read_file_stream(spark, src, EVENT_SCHEMA)
    q = I.run_incremental(stream, batch_fn, ckpt)
    q.awaitTermination(120)
    assert sum(n for _, n in seen) == 1  # only the newly-arrived file


def test_streaming_window_agg_matches_batch(spark, tmpdir):
    import datetime as dt

    src = f"{tmpdir}/in"
    ckpt = f"{tmpdir}/ckpt"
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "click") for i in range(12)
    ]
    _write_batch(spark, src, rows)

    results = []

    def batch_fn(df, batch_id):
        agg = I.tumbling_window_agg(df, "ts", "5 minutes", watermark=None)
        results.extend(
            (r["win"]["start"], r["n_events"]) for r in agg.collect()
        )

    stream = I.read_file_stream(spark, src, EVENT_SCHEMA)
    q = I.run_incremental(stream, batch_fn, ckpt)
    q.awaitTermination(120)

    batch = I.tumbling_window_agg(spark.read.schema(EVENT_SCHEMA).parquet(src), "ts", "5 minutes")
    expected = {(r["win"]["start"], r["n_events"]) for r in batch.collect()}
    assert set(results) == expected
    assert sum(n for _, n in results) == 12


def test_session_window(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1, "a"),
        (2, base + dt.timedelta(minutes=1), 1, "a"),  # same session
        (3, base + dt.timedelta(minutes=30), 1, "a"),  # new session
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = I.session_window_agg(df, "ts", gap="5 minutes", key_cols=["user_id"])
    counts = sorted(r["n_events"] for r in out.collect())
    assert counts == [1, 2]
