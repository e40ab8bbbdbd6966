"""Streaming ExactSubstr intake (streaming/exactsubstr_intake.py):
batch parity with the static operator, cross-batch removal, seen-not-
kept semantics, and replay idempotency."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.exactsubstr_intake import (
    exactsubstr_admit,
    make_batch_fn,
    streaming_exactsubstr_dedup,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING"
S = " ".join(f"w{i}" for i in range(30))
T = " ".join(f"t{i}" for i in range(30))


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="streames-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_single_batch_equals_batch_operator(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + S + " gamma"),
            (2, "intro " + S + " outro"),
            (3, T + " " + T),
            (4, None),
        ],
    )
    streamed, _ = exactsubstr_admit(docs, None, min_tokens=20)
    batch = D.exactsubstr_rewrite(docs, min_tokens=20)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_cross_batch_removal_and_seen_not_kept(spark, workdir):
    fn = make_batch_fn(workdir)
    # batch 0: S arrives twice — doc 1 keeps it, doc 2 loses it
    fn(_docs(spark, [(1, "alpha " + S), (2, "beta " + S + " tail")]), 0)
    # batch 1: S arrives again (historical) AND fresh content T
    fn(_docs(spark, [(10, S + " " + T)]), 1)
    kept = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{workdir}/kept").collect()
    }
    assert kept[1]["n_removed"] == 0
    assert kept[2]["n_removed"] == 30
    # doc 10: historical S removed entirely (no protection — history
    # holds the first occurrence); fresh T kept
    assert kept[10]["text_dedup"] == T
    assert kept[10]["n_removed"] == 30
    # batch 2: content equal to what doc 2 SAW but lost ('beta ' + S
    # prefix region) — the anchor state covers seen-not-kept content,
    # and T (kept in batch 1) is also historical now
    fn(_docs(spark, [(20, T)]), 2)
    kept20 = spark.read.parquet(f"{workdir}/kept/batch_id=2").collect()[0]
    assert kept20["text_dedup"] == "" and kept20["n_removed"] == 30


def test_replay_is_noop(spark, workdir):
    fn = make_batch_fn(workdir)
    fn(_docs(spark, [(1, "alpha " + S)]), 0)
    fn(_docs(spark, [(10, S + " extra words here")]), 1)
    before = sorted(
        map(tuple, spark.read.parquet(f"{workdir}/kept").collect())
    )
    anchors_before = sorted(
        (r["g1"], r["g2"])
        for r in spark.read.parquet(f"{workdir}/anchors").collect()
    )
    # replay batch 1: overwrites its own dirs, reads exclude itself
    fn(_docs(spark, [(10, S + " extra words here")]), 1)
    after = sorted(
        map(tuple, spark.read.parquet(f"{workdir}/kept").collect())
    )
    anchors_after = sorted(
        (r["g1"], r["g2"])
        for r in spark.read.parquet(f"{workdir}/anchors").collect()
    )
    assert before == after and anchors_before == anchors_after


def test_streaming_end_to_end(spark, workdir):
    src = f"{workdir}/src"
    _docs(spark, [(1, "alpha " + S)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = streaming_exactsubstr_dedup(
        spark.readStream.schema(DOC_SCHEMA).parquet(src), workdir
    )
    q.awaitTermination(120)
    _docs(spark, [(10, S + " fresh tail of unique words")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = streaming_exactsubstr_dedup(
        spark.readStream.schema(DOC_SCHEMA).parquet(src), workdir
    )
    q2.awaitTermination(120)
    kept = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{workdir}/kept").collect()
    }
    assert kept[1]["n_removed"] == 0
    assert kept[10]["n_removed"] == 30
    assert kept[10]["text_dedup"] == "fresh tail of unique words"


def test_legacy_60bit_anchor_state_fails_loudly(spark, workdir):
    # a pre-120-bit state dir has a single 'g BIGINT' column; reading
    # it under the new schema would yield NULL g1/g2 and the history
    # semi join would silently admit previously-seen content
    spark.createDataFrame(
        [(12345, "0")], "g BIGINT, batch_id STRING"
    ).write.mode("overwrite").parquet(f"{workdir}/anchors")
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.exactsubstr_intake import (
        _read_anchors,
    )

    with pytest.raises(ValueError, match="legacy 60-bit"):
        _read_anchors(spark, workdir, 1)


def test_unrecognized_anchor_state_fails_loudly(spark, workdir):
    spark.createDataFrame(
        [(1, "0")], "weird BIGINT, batch_id STRING"
    ).write.mode("overwrite").parquet(f"{workdir}/anchors")
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.exactsubstr_intake import (
        _read_anchors,
    )

    with pytest.raises(ValueError, match="expected"):
        _read_anchors(spark, workdir, 1)
