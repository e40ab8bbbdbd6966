"""End-to-end streaming curation intake (plans/curation_intake.py):
quality rules → decontamination → cross-batch LSH admission → kept sink
+ live HLL registers, composed from individually-verified parts."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans.curation_intake import (
    make_intake_batch_fn,
    run_curation_intake,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
    hll_state_estimate,
)

DOC_SCHEMA = "doc_id BIGINT, text STRING"

GOOD_A = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food for the long cold winter"
)
NEAR_A = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food for the long cold night"
)
GOOD_B = (
    "spark keeps the state of a stream in the checkpoint and it restores "
    "every batch of records to the exact offset it saw before the failure"
)
LOW_QUALITY = "tiny doc"
LEAKED = (
    "the benchmark answer is exactly forty two and the model must not see "
    "it during training because that would be a leak of the test data"
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="intake-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_intake_end_to_end_two_batches(spark, workdir, tmp_path):
    src = str(tmp_path / "src")
    bench = spark.createDataFrame([(900, LEAKED)], DOC_SCHEMA)
    spark.createDataFrame(
        [(1, GOOD_A), (2, LOW_QUALITY), (3, LEAKED)], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(10, NEAR_A), (11, GOOD_B)], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = run_curation_intake(stream, workdir, bench, min_words=5, shingle_n=3)
    q.awaitTermination(180)

    kept = spark.read.parquet(f"{workdir}/kept")
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # 2 fails quality, 3 is contaminated, 10 is a near-dup of admitted 1
    assert ids == [1, 11]

    est = hll_state_estimate(spark, workdir, p=12).collect()[0]
    assert abs(est["estimate"] - 2) < 1  # two distinct admitted texts


def test_intake_batch_fn_replay_idempotent(spark, workdir):
    bench = spark.createDataFrame([(900, LEAKED)], DOC_SCHEMA)
    fn = make_intake_batch_fn(workdir, bench, min_words=5, shingle_n=3)
    b0 = spark.createDataFrame([(1, GOOD_A), (3, LEAKED)], DOC_SCHEMA)
    b1 = spark.createDataFrame([(10, NEAR_A), (11, GOOD_B)], DOC_SCHEMA)
    fn(b0, 0)
    fn(b1, 1)
    kept_before = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{workdir}/kept").collect()
    )
    assert kept_before == [1, 11]
    # crash/replay of BOTH epochs must change nothing
    fn(b0, 0)
    fn(b1, 1)
    kept_after = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{workdir}/kept").collect()
    )
    assert kept_after == kept_before
    est = hll_state_estimate(spark, workdir, p=12).collect()[0]
    assert abs(est["estimate"] - 2) < 1


def test_intake_with_exactsubstr_rewriting(spark, workdir):
    """The optional ExactSubstr stage: an admitted batch-2 doc embedding
    a 20+-token span first seen in batch 1 lands REWRITTEN (the span
    removed, the fresh tail kept); anchors state accrues per epoch; a
    replayed epoch is a no-op. Doc 10 shares only ~25 of its ~75 tokens
    with doc 1, so the LSH stage ADMITS it (no bucket collision at that
    Jaccard) and the range rewriting is what catches the verbatim
    inclusion — exactly the two stages' division of labor."""
    S = " ".join(GOOD_A.split()[:25])  # realistic 25-token span
    TAIL = (
        GOOD_B + " moreover it writes every result into a versioned "
        "table and it keeps the old copy until the new swap has landed "
        "so a failure can always be rolled back to the last good state"
    )
    bench = spark.createDataFrame([(900, LEAKED)], DOC_SCHEMA)
    fn = make_intake_batch_fn(
        workdir, bench, min_words=5, shingle_n=3,
        exactsubstr_min_tokens=20,
    )
    fn(spark.createDataFrame([(1, "intro words " + S)], DOC_SCHEMA), 0)
    fn(spark.createDataFrame([(10, S + " " + TAIL)], DOC_SCHEMA), 1)
    kept = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{workdir}/kept").collect()
    }
    assert 1 in kept and 10 in kept, sorted(kept)
    assert kept[1]["n_removed"] == 0
    assert kept[10]["n_removed"] == 25
    assert kept[10]["text"] == " ".join(TAIL.lower().split())
    # replay epoch 1: same state, same sink
    before = sorted(map(tuple, spark.read.parquet(f"{workdir}/kept").collect()))
    fn(spark.createDataFrame([(10, S + " " + TAIL)], DOC_SCHEMA), 1)
    after = sorted(map(tuple, spark.read.parquet(f"{workdir}/kept").collect()))
    assert before == after


def test_intake_c4_stage_cleans_before_states(spark, workdir):
    """Optional stage 0 (c4_clean): line-level cleaning runs BEFORE any
    content key — a javascript boilerplate line is stripped from the
    admitted text, a lorem-ipsum doc and a too-few-lines doc never reach
    the sink — mirroring the batch cascade's stage 0 semantics."""
    L1 = "the quick brown fox jumps over the lazy dog again tonight."
    L2 = "a second proper sentence with plenty of useful words follows here."
    JS = "please enable javascript to view this page"
    LOREM = (
        "this doc has lorem ipsum hiding inside of it somewhere today.\n"
        "another perfectly fine sentence with enough words comes after it."
    )
    bench = spark.createDataFrame([(900, LEAKED)], DOC_SCHEMA)
    fn = make_intake_batch_fn(
        workdir, bench, min_words=5, shingle_n=3,
        c4_clean={"min_kept_lines": 2},
    )
    fn(
        spark.createDataFrame(
            [(20, L1 + "\n" + JS + "\n" + L2), (21, LOREM), (22, L1)],
            DOC_SCHEMA,
        ),
        0,
    )
    kept = {r["doc_id"]: r for r in spark.read.parquet(f"{workdir}/kept").collect()}
    assert sorted(kept) == [20]
    # the sink carries the CLEANED text: the javascript line is gone
    assert kept[20]["text"] == L1 + "\n" + L2
