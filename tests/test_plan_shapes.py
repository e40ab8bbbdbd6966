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


def test_dsir_ratio_table_broadcasts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_en = F.coalesce(F.col("lang"), F.lit("")) == "en"
    plan = T.dsir_select(docs.filter(~is_en), docs.filter(is_en), k=10, dim=256)
    ex = _executed(plan)
    # log-ratio table (≤ dim rows) joins back onto the raw features via
    # broadcast; the raw corpus must not shuffle for the scoring join
    assert "BroadcastHashJoin" in ex
    assert "EvalPython" not in ex and "InPandas" not in ex
    # top-k is TakeOrdered, not a global Sort+Limit materialization
    assert "TakeOrderedAndProject" in ex


def test_contamination_scores_broadcasts_bench(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    plan = D.contamination_scores(docs, bench, shingle_n=3)
    ex = _executed(plan)
    assert "BroadcastHashJoin" in ex
    assert "EvalPython" not in ex


def test_repeated_passages_single_keyed_shuffle_and_takeordered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = T.repeated_passages(docs, n=5, min_docs=2, k=20)
    ex = _executed(plan)
    assert "TakeOrderedAndProject" in ex
    assert "EvalPython" not in ex


def test_logreg_iteration_broadcasts_weights(spark, sf_dir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        classifier as CL,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "__y", (F.coalesce(F.col("lang"), F.lit("")) == "en").cast("double")
    )
    w = CL.logreg_fit(docs, "__y", dim=32, n_iter=2)
    plan = CL.logreg_predict(docs, w, dim=32)
    ex = _executed(plan)
    # the ≤ dim+1-row weight table must broadcast onto the features
    assert "BroadcastHashJoin" in ex
    assert "SortMergeJoin" not in ex


def test_pca_component_broadcast_and_no_python(spark, sf_dir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        similarity as SM,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comp = SM.pca_power_iteration(emb, n_iter=1)
    plan = SM.pca_project(emb, comp)
    ex = _executed(plan)
    assert "BroadcastHashJoin" in ex or "BroadcastExchange" in ex
    assert "EvalPython" not in ex and "InPandas" not in ex
    assert "CartesianProduct" not in ex
