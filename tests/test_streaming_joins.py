"""Stream-static joins, watermark dedup, stream-stream joins."""

import datetime as dt
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming import joins as J

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream-join-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(spark, path, rows, schema=EVENT_SCHEMA):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _drain(stream_df, name, ckpt):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_static_join_enriches(spark, tmpdir):
    src = f"{tmpdir}/in"
    _write(spark, src, [(1, T0, 10, "click"), (2, T0, 11, "view"), (3, T0, 99, "click")])
    dim = spark.createDataFrame(
        [(10, "cluster_01"), (11, "cluster_02")], ["user_id", "cluster_id"]
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = J.stream_static_join(stream, dim, on="user_id")
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    _drain(out, name, f"{tmpdir}/ckpt")
    rows = {r.event_id: r.cluster_id for r in spark.table(name).collect()}
    # left join: unmatched user keeps the row with NULL cluster (the
    # reference's invalid-bucket shape)
    assert rows == {1: "cluster_01", 2: "cluster_02", 3: None}


def test_dedup_within_watermark(spark, tmpdir):
    src = f"{tmpdir}/in"
    rows = [
        (1, T0, 10, "click"),
        (1, T0 + dt.timedelta(minutes=1), 10, "click"),  # dup key within horizon
        (2, T0 + dt.timedelta(minutes=2), 11, "view"),
    ]
    _write(spark, src, rows)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = J.dedup_within_watermark(stream, keys=["event_id"], ts_col="ts")
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    _drain(out, name, f"{tmpdir}/ckpt")
    got = sorted(r.event_id for r in spark.table(name).collect())
    assert got == [1, 2]


def test_stream_stream_join_within_bound(spark, tmpdir):
    clicks_p, buys_p = f"{tmpdir}/clicks", f"{tmpdir}/buys"
    _write(spark, clicks_p, [(1, T0, 10, "click"), (2, T0, 11, "click")])
    buys = [
        (101, T0 + dt.timedelta(minutes=30), 10, "purchase"),  # within 1h of click
        (102, T0 + dt.timedelta(hours=3), 11, "purchase"),  # outside bound
    ]
    _write(spark, buys_p, buys)
    clicks = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(clicks_p)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            "user_id",
        )
    )
    purchases = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(buys_p)
        .select(
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
            F.col("user_id").alias("buy_user"),
        )
    )
    # align key names for the join helper
    purchases = purchases.withColumnRenamed("buy_user", "user_id")
    out = J.stream_stream_join(
        clicks, purchases, on="user_id", left_ts="click_ts", right_ts="buy_ts",
        within="1 hour",
    ).select("click_id", "buy_id")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    _drain(out, name, f"{tmpdir}/ckpt")
    got = sorted((r.click_id, r.buy_id) for r in spark.table(name).collect())
    # only the within-bound pair joins; the 3-hour-later purchase does not
    assert got == [(1, 101)]
