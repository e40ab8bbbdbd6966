"""Streaming exact-recall prefix intake (streaming/prefix_intake.py):
verified admission (no bucket-collision false drops), cross-batch
state, replay idempotency, and batch↔operator parity."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.prefix_intake import (
    _read_state,
    init_prefix_intake,
    prefix_admit,
    streaming_prefix_dedup,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING"

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food for the long cold winter"
)
NEAR_DUP = BASE.replace("winter", "night")
# shares exactly one rare 3-gram run with BASE but is far below J=1/2 —
# an LSH bucket scheme may collide it; the verified intake MUST admit it
ONE_SHARED_RUN = (
    "quick brown fox appears once here amid otherwise unrelated prose "
    "about parquet row groups column chunks and predicate pushdown logic"
)
DISTINCT = (
    "completely different content about spark structured streaming state "
    "stores watermarks and exactly once sinks with idempotent batch writes"
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="streamprefix-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_prefix_admit_verifies_instead_of_bucket_dropping(spark):
    docs = _docs(
        spark,
        [(1, BASE), (2, NEAR_DUP), (3, ONE_SHARED_RUN), (4, DISTINCT)],
    )
    dfreq = spark.createDataFrame([], "s BIGINT, sdf BIGINT")
    kept, new_pref, new_sh = prefix_admit(docs, dfreq, claimed=None)
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    # 2 is a true near-dup of 1 (J >= 1/2) -> dropped, min id wins;
    # 3 shares shingles with 1 but J << 1/2 -> VERIFIED and admitted
    assert kept_ids == [1, 3, 4]
    # state rows cover exactly the kept docs
    assert sorted(
        set(r["doc_id"] for r in new_pref.collect())
    ) == kept_ids
    assert sorted(r["doc_id"] for r in new_sh.collect()) == kept_ids


def test_prefix_admit_matches_batch_operator_against_history(spark):
    corpus = _docs(spark, [(1, BASE), (4, DISTINCT)])
    batch = _docs(spark, [(10, NEAR_DUP), (11, ONE_SHARED_RUN)])
    dfreq, corp_pref, corp_sh = D.build_prefix_index(corpus)
    kept, _, _ = prefix_admit(
        batch, dfreq, claimed=(corp_pref, corp_sh)
    )
    expect = D.prefix_dedup_against_corpus(
        batch, (dfreq, corp_pref, corp_sh)
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in expect.collect()
    )


def _drain(spark, src, workdir):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_prefix_dedup(stream, workdir)
    q.awaitTermination(180)


def test_streaming_prefix_cross_batch_and_replay(spark, workdir):
    src = f"{workdir}/src"
    init_prefix_intake(spark, workdir, _docs(spark, [(0, DISTINCT)]))
    _docs(spark, [(1, BASE), (3, ONE_SHARED_RUN)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, workdir)
    # batch 2: a near-dup of the batch-1 BASE doc arrives -> rejected
    _docs(spark, [(10, NEAR_DUP), (11, DISTINCT + " extra tail")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    _drain(spark, src, workdir)
    kept = spark.read.parquet(f"{workdir}/kept")
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    assert kept_ids == [1, 3, 11]
    # replay: re-running batch_fn for an already-written epoch is a
    # no-op (own-dir overwrite; reads exclude own batch)
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.prefix_intake import (
        make_batch_fn,
    )

    state_before = sorted(
        (r["doc_id"], r["s"])
        for r in _read_state(spark, workdir, 10**9)[0].collect()
    )
    make_batch_fn(workdir)(_docs(spark, [(10, NEAR_DUP), (11, DISTINCT + " extra tail")]), 1)
    state_after = sorted(
        (r["doc_id"], r["s"])
        for r in _read_state(spark, workdir, 10**9)[0].collect()
    )
    assert state_before == state_after
    kept_after = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{workdir}/kept").collect()
    )
    assert kept_after == kept_ids


def test_half_written_first_epoch_reads_as_no_state(spark, workdir):
    """Crash between the prefix/ and shingles/ writes of the FIRST
    micro-batch: prefix/ exists, shingles/ doesn't. _read_state must
    report "no state yet" (None) so the replay's own overwrite heals
    the torn epoch, instead of failing on the missing shingles path."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.prefix_intake import (
        make_batch_fn,
    )

    docs = _docs(spark, [(1, BASE), (4, DISTINCT)])
    dfreq = spark.createDataFrame([], "s BIGINT, sdf BIGINT")
    _, new_pref, _ = prefix_admit(docs, dfreq, claimed=None)
    # simulate the torn first epoch: prefix/ written, shingles/ absent
    new_pref.withColumn("batch_id", F.lit("0")).write.mode(
        "overwrite"
    ).parquet(f"{workdir}/prefix/batch_id=0")
    assert _read_state(spark, workdir, 1) is None
    # the replay heals: run the batch callback for epoch 0 again, then
    # state reads work and admission over it behaves normally
    make_batch_fn(workdir)(docs, 0)
    pref, sh = _read_state(spark, workdir, 1)
    assert sorted(r["doc_id"] for r in sh.select("doc_id").distinct().collect()) == [1, 4]
    kept2, _, _ = prefix_admit(
        _docs(spark, [(10, NEAR_DUP)]), dfreq, (pref, sh)
    )
    assert kept2.count() == 0
