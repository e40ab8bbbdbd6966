"""Bucketed shuffle-free joins + REPLACE-INTO merge upsert."""

import uuid

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.upsert import (
    merge_upsert,
    merge_upsert_audited,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources import bucketing


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    """lineitem + orders written bucketed on the order key."""
    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"li_b_{suffix}", f"o_b_{suffix}"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    bucketing.write_bucketed(
        li, lt, "l_orderkey", 4, sort_col="l_orderkey", path=str(tmp_path / lt)
    )
    bucketing.write_bucketed(
        o, ot, "o_orderkey", 4, sort_col="o_orderkey", path=str(tmp_path / ot)
    )
    yield lt, ot
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {ot}")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_pair):
    lt, ot = bucketed_pair
    li, o = bucketing.read_table(spark, lt), bucketing.read_table(spark, ot)
    # force the sort-merge path (no broadcast) to prove co-location alone
    # satisfies the join's distribution
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        assert bucketing.count_exchanges(joined) == 0
        # an un-bucketed equivalent of the same join DOES shuffle
        li_plain = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o_plain = spark.read.parquet(f"{sf_dir}/orders.parquet")
        plain = li_plain.join(o_plain, li_plain.l_orderkey == o_plain.o_orderkey)
        assert bucketing.count_exchanges(plain) == 2
        # and the bucketed result is still correct
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_is_shuffle_free(spark, bucketed_pair):
    lt, _ = bucketed_pair
    li = bucketing.read_table(spark, lt)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert bucketing.count_exchanges(agg) == 0


def test_merge_upsert_replace_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    source = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)], ["k", "s", "v"])
    out = {r.k: (r.s, r.v) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_multirow_key(spark):
    # MySQL REPLACE removes ALL rows with the key, inserts ALL new ones
    target = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "s"])
    source = spark.createDataFrame([(1, "new")], ["k", "s"])
    rows = sorted((r.k, r.s) for r in merge_upsert(target, source, ["k"]).collect())
    assert rows == [(1, "new"), (2, "z")]


def test_merge_upsert_audited_stamps(spark):
    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    source = spark.createDataFrame([(2, 99.0)], ["k", "v"])
    out = merge_upsert_audited(target, source, ["k"], now_epoch=1700000000)
    rows = {r.k: (r.v, r.arrived_time, r.updated_time) for r in out.collect()}
    assert rows[2] == (99.0, 1700000000, 1700000000)
    assert rows[1] == (10.0, None, None)
