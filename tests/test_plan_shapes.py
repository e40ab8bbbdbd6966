"""Physical-plan pins for the round-3 curation operators.

PLANS.md records these numbers as documentation; this test enforces the
scale-critical ones so a refactor that silently adds a shuffle, drops a
broadcast, or pushes work into Python fails CI instead of the 100 TB run.
"""

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import dedup as D
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import text as T
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.bucketing import (
    count_exchanges,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_stats_is_map_side_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = T.repetition_stats(docs)
    assert count_exchanges(plan) == 0  # pure projection — no shuffle
    ex = _executed(plan)
    assert "EvalPython" not in ex and "InPandas" not in ex


def test_text_stats_is_map_side_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = T.text_stats(docs)
    assert count_exchanges(plan) == 0
    assert "EvalPython" not in _executed(plan)


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    plan = D.decontaminate(docs, bench, shingle_n=3)
    ex = _executed(plan)
    # the gram probe and the final anti-join must both be broadcast —
    # the corpus must never shuffle on content
    assert ex.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in ex
    assert "EvalPython" not in ex


def test_unigram_logprob_has_no_python_and_broadcast_total(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = T.unigram_logprob(docs)
    ex = _executed(plan)
    assert "EvalPython" not in ex and "InPandas" not in ex
    # the corpus-total scalar must come in via broadcast (q11 shape),
    # never a shuffled cartesian
    assert "BroadcastNestedLoopJoin" in ex or "BroadcastExchange" in ex
    assert "CartesianProduct" not in ex
