"""Scale-guard tests: the raw quadratic baselines and the token-budget
level window must refuse (or quantize) rather than silently build plans
that melt at corpus size."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
    similarity as S,
    util as U,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.util import (
    QuadraticPlanError,
)


@pytest.fixture()
def small_guard(monkeypatch):
    monkeypatch.setattr(U, "QUADRATIC_GUARD_ROWS", 10)


def _docs(spark, n=20):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(n)],
        ["doc_id", "text"],
    )


def _vecs(spark, n=20):
    return spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(n)], ["vec_id", "embedding"]
    )


def test_jaccard_pairs_guard(spark, small_guard):
    docs = _docs(spark)
    with pytest.raises(QuadraticPlanError, match="jaccard_pairs"):
        D.jaccard_pairs(docs, threshold=0.1)
    # explicit override still builds the exact baseline
    out = D.jaccard_pairs(docs, threshold=0.1, allow_quadratic=True)
    assert out.count() > 0
    # the candidate-verify path is the scale sibling: never guarded
    cands = spark.createDataFrame([(0, 1)], ["a", "b"])
    assert D.jaccard_pairs(docs, threshold=0.0, candidates=cands).count() == 1


def test_cosine_pairs_guard(spark, small_guard):
    vecs = _vecs(spark)
    with pytest.raises(QuadraticPlanError, match="cosine_pairs"):
        S.cosine_pairs(vecs, threshold=0.5)
    assert S.cosine_pairs(vecs, 0.99, allow_quadratic=True).count() > 0


def test_cosine_topk_guards_query_side(spark, small_guard):
    corpus = _vecs(spark, 20)
    few_queries = corpus.filter(F.col("vec_id") < 3)
    # corpus side streams — a big corpus with few queries is fine
    assert S.cosine_topk(corpus, few_queries, k=2).count() == 6
    # a corpus-sized query set is all-pairs: guarded
    with pytest.raises(QuadraticPlanError, match="cosine_topk"):
        S.cosine_topk(corpus, corpus, k=2, round_to=6)
    assert S.cosine_topk(corpus, corpus, k=1, allow_quadratic=True).count() == 20


def test_cosine_topk_guard_uses_its_own_threshold(spark):
    # the unpatched default (50k queries) never trips on realistic sets
    corpus = _vecs(spark, 30)
    assert S.cosine_topk(corpus, corpus.limit(5), k=2).count() == 10


def test_token_budget_rejects_continuous_score(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sampling import (
        select_token_budget,
    )

    df = spark.createDataFrame(
        [(i, 1.0 / (i + 3), 10) for i in range(100)],
        ["doc_id", "score", "n_tok"],
    )
    with pytest.raises(ValueError, match="distinct levels"):
        select_token_budget(df, 500, "score", "n_tok", max_levels=50)
    # quantize collapses the levels and the greedy cut proceeds
    kept = select_token_budget(
        df, 500, "score", "n_tok", max_levels=50, quantize=1
    )
    assert kept.count() == 50  # 50 docs x 10 tokens fill the budget
    # discrete scores unchanged by the guard
    disc = spark.createDataFrame(
        [(i, float(i % 3), 10) for i in range(30)],
        ["doc_id", "score", "n_tok"],
    )
    assert select_token_budget(disc, 100, "score", "n_tok").count() == 10
