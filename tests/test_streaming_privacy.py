"""Streaming k-anonymity census state (streaming/sketch_state.py):
live census across micro-batches, batch parity, replay idempotency,
negative-epoch retraction exactness, over-retraction guard, and
compaction."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    privacy as PV,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
    compact_kanon_state,
    make_kanon_batch_fn,
    read_kanon_below_k,
    read_kanon_census,
    read_kanon_state,
    streaming_kanon,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.state_retraction import (
    retract_from_kanon_state,
)

SCH = "zip STRING, age INT, doc_id BIGINT"
QI = ["zip", "age"]


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="streamkanon-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch0(spark):
    rows = [("90210", 30, i) for i in range(4)] + [("10001", 40, 100)]
    return spark.createDataFrame(rows, SCH)


def _batch1(spark):
    rows = (
        [("90210", 30, 200 + i) for i in range(2)]
        + [("10001", 40, 300), (None, 50, 400), (None, 50, 401)]
    )
    return spark.createDataFrame(rows, SCH)


def _census_dict(df):
    r = df.first()
    return {c: r[c] for c in df.columns}


def test_streaming_kanon_matches_batch_census(spark, workdir, tmp_path):
    src = str(tmp_path / "src")
    _batch0(spark).coalesce(1).write.mode("append").parquet(src)
    _batch1(spark).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCH)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_kanon(stream, workdir, QI)
    q.awaitTermination(180)

    whole = _batch0(spark).unionByName(_batch1(spark))
    batch = _census_dict(PV.k_anonymity_report(whole, QI, k=3))
    streamed = _census_dict(read_kanon_census(spark, workdir, QI, k=3))
    assert streamed == batch
    # classes: (90210,30)=6, (10001,40)=2, (NULL,50)=2
    state = {(r["zip"], r["age"]): r["__cnt"]
             for r in read_kanon_state(spark, workdir, QI).collect()}
    assert state == {("90210", 30): 6, ("10001", 40): 2, (None, 50): 2}
    risky = read_kanon_below_k(spark, workdir, QI, k=3)
    assert {(r["zip"], r["age"], r["class_size"]) for r in risky.collect()} \
        == {("10001", 40, 2), (None, 50, 2)}


def test_kanon_empty_state_and_replay_idempotent(spark, workdir):
    # empty-but-valid census before any commit
    c0 = _census_dict(read_kanon_census(spark, workdir, QI, k=5))
    assert c0["n_classes"] == 0 and c0["min_class_size"] is None
    assert read_kanon_state(spark, workdir, QI) is None
    assert read_kanon_below_k(spark, workdir, QI) is None

    fn = make_kanon_batch_fn(workdir, QI)
    fn(_batch0(spark), 0)
    before = _census_dict(read_kanon_census(spark, workdir, QI, k=3))
    fn(_batch0(spark), 0)  # replayed epoch overwrites its own dir
    assert _census_dict(read_kanon_census(spark, workdir, QI, k=3)) == before


def test_kanon_retraction_equals_rebuild_without_rows(spark, workdir):
    fn = make_kanon_batch_fn(workdir, QI)
    fn(_batch0(spark), 0)
    fn(_batch1(spark), 1)
    # GDPR delete: both NULL-zip rows and one 90210 row leave
    gone = spark.createDataFrame(
        [(None, 50, 400), (None, 50, 401), ("90210", 30, 0)], SCH
    )
    out = retract_from_kanon_state(spark, workdir, gone, QI)
    assert out == {"classes_decremented": 2, "rows_retracted": 3}

    whole = _batch0(spark).unionByName(_batch1(spark))
    surviving = whole.join(
        gone.select("doc_id"), "doc_id", "left_anti"
    )
    for k in (2, 3, 10):
        assert _census_dict(read_kanon_census(spark, workdir, QI, k=k)) \
            == _census_dict(PV.k_anonymity_report(surviving, QI, k=k))
    # the fully-retracted NULL class is GONE, not a zero row
    state = {(r["zip"], r["age"]): r["__cnt"]
             for r in read_kanon_state(spark, workdir, QI).collect()}
    assert (None, 50) not in state and state[("90210", 30)] == 5


def test_kanon_over_retraction_guard(spark, workdir):
    fn = make_kanon_batch_fn(workdir, QI)
    fn(_batch0(spark), 0)
    too_many = spark.createDataFrame(
        [("10001", 40, i) for i in range(2)], SCH  # class only has 1
    )
    with pytest.raises(ValueError, match="exceeds the net count"):
        retract_from_kanon_state(spark, workdir, too_many, QI)
    # state untouched
    assert _census_dict(read_kanon_census(spark, workdir, QI, k=3)) == \
        _census_dict(PV.k_anonymity_report(_batch0(spark), QI, k=3))
    # never-ingested class is also refused
    with pytest.raises(ValueError, match="exceeds the net count"):
        retract_from_kanon_state(
            spark, workdir,
            spark.createDataFrame([("zzz", 1, 9)], SCH), QI,
        )
    with pytest.raises(ValueError, match="no committed state"):
        retract_from_kanon_state(
            spark, tempfile.mkdtemp(prefix="kanon-empty-"),
            too_many, QI,
        )


def test_kanon_compact_preserves_census(spark, workdir):
    fn = make_kanon_batch_fn(workdir, QI)
    fn(_batch0(spark), 0)
    fn(_batch1(spark), 1)
    gone = spark.createDataFrame([(None, 50, 400), (None, 50, 401)], SCH)
    retract_from_kanon_state(spark, workdir, gone, QI)
    before = _census_dict(read_kanon_census(spark, workdir, QI, k=3))

    merged_away, rows_after = compact_kanon_state(spark, workdir, QI, 2)
    assert merged_away == 2  # classes/batch_id=0 + the retraction dir
    assert rows_after == 2  # net-zero NULL class dropped in the fold
    assert _census_dict(read_kanon_census(spark, workdir, QI, k=3)) == before
    # retraction after compact still works against the folded partition
    retract_from_kanon_state(
        spark, workdir,
        spark.createDataFrame([("10001", 40, 300)], SCH), QI,
    )
    state = {(r["zip"], r["age"]): r["__cnt"]
             for r in read_kanon_state(spark, workdir, QI).collect()}
    assert state == {("90210", 30): 6, ("10001", 40): 1}


SSCH = "zip STRING, age INT, diag STRING, doc_id BIGINT"
SQI = ["zip", "age"]


def _sbatch0(spark):
    rows = [
        ("90210", 30, "flu", 1), ("90210", 30, "flu", 2),
        ("90210", 30, "cold", 3), ("10001", 40, "covid", 4),
    ]
    return spark.createDataFrame(rows, SSCH)


def _sbatch1(spark):
    rows = [
        ("10001", 40, "covid", 5), ("10001", 40, None, 6),
        (None, 50, "flu", 7),
    ]
    return spark.createDataFrame(rows, SSCH)


def test_streaming_ldiv_and_tcloseness_match_batch(spark, workdir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        read_kanon_ldiv_census,
        read_kanon_tcloseness_census,
    )

    fn = make_kanon_batch_fn(workdir, SQI + ["diag"])
    fn(_sbatch0(spark), 0)
    fn(_sbatch1(spark), 1)
    whole = _sbatch0(spark).unionByName(_sbatch1(spark))

    got = _census_dict(
        read_kanon_ldiv_census(spark, workdir, SQI, "diag", l=2)
    )
    want = _census_dict(PV.l_diversity_report(whole, SQI, "diag", l=2))
    assert got == want

    gt = _census_dict(read_kanon_tcloseness_census(
        spark, workdir, SQI, "diag", 1, 5))
    wt = _census_dict(PV.t_closeness_report(whole, SQI, "diag", 1, 5))
    assert gt == wt

    # and after a retraction, both reads still equal batch-on-survivors
    gone = spark.createDataFrame(
        [("10001", 40, None, 6), (None, 50, "flu", 7)], SSCH
    )
    retract_from_kanon_state(spark, workdir, gone, SQI + ["diag"])
    surv = whole.join(gone.select("doc_id"), "doc_id", "left_anti")
    assert _census_dict(
        read_kanon_ldiv_census(spark, workdir, SQI, "diag", l=2)
    ) == _census_dict(PV.l_diversity_report(surv, SQI, "diag", l=2))
    assert _census_dict(read_kanon_tcloseness_census(
        spark, workdir, SQI, "diag", 1, 5)
    ) == _census_dict(PV.t_closeness_report(surv, SQI, "diag", 1, 5))
    # the k-census over the FULL tuple still reads off the same state
    assert _census_dict(
        read_kanon_census(spark, workdir, SQI + ["diag"], k=2)
    ) == _census_dict(PV.k_anonymity_report(surv, SQI + ["diag"], k=2))


def test_streaming_tcloseness_ordinal_and_empty(spark, workdir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        read_kanon_ldiv_census,
        read_kanon_tcloseness_census,
    )

    # empty-but-valid reads before the first commit
    e1 = _census_dict(read_kanon_ldiv_census(spark, workdir, SQI, "diag"))
    assert e1["n_classes"] == 0 and e1["min_distinct_sensitive"] is None
    e2 = _census_dict(read_kanon_tcloseness_census(
        spark, workdir, SQI, "diag", 1, 5, ["a", "b"]))
    assert e2["metric"] == "ordinal" and e2["n_classes"] == 0

    fn = make_kanon_batch_fn(workdir, ["zip", "diag"])
    rows = spark.createDataFrame(
        [("A", 0, "lo", 1), ("A", 0, "lo", 2), ("B", 0, "hi", 3),
         ("B", 0, "lo", 4)], SSCH,
    )
    fn(rows, 0)
    got = _census_dict(read_kanon_tcloseness_census(
        spark, workdir, ["zip"], "diag", 1, 5, ["lo", "hi"]))
    want = _census_dict(PV.t_closeness_report(
        rows, ["zip"], "diag", 1, 5, ["lo", "hi"]))
    assert got == want and got["metric"] == "ordinal"
    # unlisted value raises on the ordinal read
    with pytest.raises(Exception, match="not in ordered_values"):
        read_kanon_tcloseness_census(
            spark, workdir, ["zip"], "diag", 1, 5, ["lo"]
        ).collect()
