"""applyInPandasWithState operator tests: state must persist ACROSS
micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""

import shutil
import tempfile

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming import (
    incremental as I,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.stateful import (
    streaming_dedup,
    streaming_running_counts,
)

SCHEMA = StructType(
    [
        StructField("fp", StringType(), True),
        StructField("doc_id", LongType(), True),
        StructField("user_id", LongType(), True),
    ]
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stateful-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_across_batches(spark, tmpdir):
    src = f"{tmpdir}/in"
    # two files → two micro-batches (maxFilesPerTrigger=1)
    _write_file(spark, src, [("a", 1, 10), ("b", 2, 10)])
    _write_file(spark, src, [("b", 3, 11), ("c", 4, 11)])

    emitted: list[tuple[str, int]] = []

    def collect(df, _bid):
        emitted.extend((r["fp"], r["doc_id"]) for r in df.collect())

    def run_once():
        stream = I.read_file_stream(spark, src, SCHEMA, max_files_per_trigger=1)
        deduped = streaming_dedup(
            stream, "fp", "fp string, doc_id bigint", carry_cols=["doc_id"]
        )
        q = (
            deduped.writeStream.foreachBatch(collect)
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # 'b' appears in both batches → exactly one emission (the first)
    assert {fp for fp, _ in emitted} == {"a", "b", "c"}
    assert len(emitted) == 3

    # a later run with a re-sent duplicate emits nothing new (state kept)
    _write_file(spark, src, [("a", 9, 12), ("d", 5, 12)])
    emitted.clear()
    run_once()
    assert {fp for fp, _ in emitted} == {"d"}  # 'a' suppressed by persisted state


def test_streaming_running_counts(spark, tmpdir):
    src = f"{tmpdir}/in"
    _write_file(spark, src, [("x", 1, 10), ("y", 2, 10), ("z", 3, 10)])
    _write_file(spark, src, [("x", 4, 10), ("y", 5, 11)])

    stream = I.read_file_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    counts = streaming_running_counts(stream, "user_id")
    q = (
        counts.writeStream.format("memory")
        .queryName("counts_out")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from counts_out").collect()
    # last emission per key reflects the running total
    latest = {}
    for r in rows:
        latest[r["user_id"]] = max(latest.get(r["user_id"], 0), r["running_count"])
    assert latest == {10: 4, 11: 1}
