"""Regression tests for the round-1 code-review findings."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import validation as V


def test_validate_distributed_quarantines_null_groups(spark):
    """A violating NULL-keyed group must not leak through the anti-join."""
    rows = [
        (None, "bad#"),   # NULL group, violating row
        (None, "123"),    # NULL group, clean row — same group, quarantined
        ("019", "456"),   # clean group
    ]
    df = spark.createDataFrame(rows, "opco_id string, supc string")
    rules = [V.Rule("supc_num", "supc", "required_numeric")]
    clean, matrix = V.validate_distributed(df, rules, "opco_id")
    assert clean.count() == 1
    assert clean.first()["opco_id"] == "019"
    m = {r["opco_id"]: r["any_violation"] for r in matrix.collect()}
    assert m[None] is True and m["019"] is False


def test_empty_rule_list_is_graceful(spark):
    df = spark.createDataFrame([("019", "1")], "opco_id string, v string")
    clean, matrix = V.validate_distributed(df, [], "opco_id")
    assert clean.count() == 1
    assert matrix.filter("any_violation").count() == 0
    assert V.invalid_rows(df, []).count() == 0
    clean2, report = V.validate(df, [], "opco_id")
    assert report.valid_count == 1 and clean2.count() == 1


def test_quarantine_isin_and_antijoin_paths_agree_on_nulls(spark):
    df = spark.createDataFrame(
        [("g0", 1), (None, 2), ("keep", 3)], "k string, v int"
    )
    small = V.quarantine(df, {"g0"}, "k")
    # NOT-IN semantics: NULL keys dropped when the bad set is non-empty
    assert {r["k"] for r in small.collect()} == {"keep"}
    big_set = {f"g{i}" for i in range(1500)}
    big = V.quarantine(df, big_set, "k")
    assert {r["k"] for r in big.collect()} == {"keep"}


def test_nanos_conversion_exact_at_boundaries(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.functions import (
        nanos_to_timestamp,
    )

    vals = [
        1704067200000000000,
        1704067200000000999,
        1704067199999999999,
        9223372036854775000,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "ts long")
    out = df.select(
        "ts", F.unix_micros(nanos_to_timestamp("ts")).alias("us")
    ).collect()
    for r in out:
        assert r["us"] == r["ts"] // 1000


def test_event_time_adapts_to_dtype(spark):
    """event_time must work on BOTH physical generations of events.ts:
    epoch-nanos bigint (old TIMESTAMP(NANOS) testdata under nanosAsLong)
    and native timestamp/timestamp_ntz (current TIMESTAMP(MICROS) data) —
    same instants out either way."""
    import datetime

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.functions import event_time

    micros = 1704067200 * 1_000_000 + 123_456
    long_df = spark.createDataFrame([(micros * 1000,)], "ts long")
    ntz_df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),)], "ts timestamp_ntz"
    )
    ltz_df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),)], "ts timestamp"
    )
    for df in (long_df, ntz_df, ltz_df):
        out = df.select(F.unix_micros(event_time(df, "ts")).alias("us")).first()
        assert out["us"] == micros, df.dtypes
        assert dict(
            df.select(event_time(df, "ts").alias("t")).dtypes
        )["t"] == "timestamp"


def test_event_time_rejects_unknown(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.functions import event_time

    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError):
        event_time(df, "ts")
    with pytest.raises(ValueError):
        event_time(df, "nope")


def test_salt_spreads_duplicate_rows(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import with_salt

    # 400 identical rows (the classic skew payload) must still spread
    df = spark.createDataFrame([("hot", 1)] * 400, "k string, v int")
    salts = {r["__salt"] for r in with_salt(df, 8).collect()}
    assert len(salts) >= 4


def test_jaccard_candidates_path_equals_unrestricted(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import dedup as D

    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e g"),
        (3, "x y z w q r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = spark.createDataFrame([(1, 2)], "a long, b long")
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           D.jaccard_pairs(df, threshold=0.0, candidates=cands).collect()}
    full = {(r["a"], r["b"]): r["jaccard"] for r in
            D.jaccard_pairs(df, threshold=0.0).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == full[(1, 2)]


def test_salted_replicate_join_contract(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
        salted_replicate_join,
    )

    facts = spark.createDataFrame([("k", i) for i in range(50)], "k string, v int")
    dim = spark.createDataFrame([("k", "L")], "k string, label string")
    out = salted_replicate_join(facts, dim, "k")
    assert out.count() == 50  # no row duplication despite the replicated dim
    # right/full joins would duplicate unmatched dim keys → rejected
    with pytest.raises(ValueError):
        salted_replicate_join(facts, dim, "k", how="full")
