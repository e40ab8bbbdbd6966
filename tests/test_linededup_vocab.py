"""Round-11 second batch (text.py): intra-doc line dedup and vocab
coverage — hand-value checks, edge cases, plan shapes."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_dedup_lines_keeps_first_in_order(spark):
    out = T.dedup_lines(
        _docs(spark, [(1, "nav\nA\nnav\nB\nA\nnav"), (2, None)])
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["n_lines"] == 6 and by[1]["n_kept"] == 3
    assert by[1]["text_dedup"] == "nav\nA\nB"
    # NULL text behaves as empty: one empty line, kept
    assert by[2]["n_lines"] == 1 and by[2]["n_kept"] == 1
    assert by[2]["text_dedup"] == ""


def test_vocab_coverage_hand_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "the the the cat"),     # 'the' x3, cat x1
            (2, "the dog runs"),        # dog/runs rare
            (3, ""),
        ],
    )
    # vocab_size=2 -> top-2 by count desc, word asc: 'the'(4), then
    # ties at 1 -> 'cat' wins alphabetically
    out = {r["doc_id"]: r for r in T.vocab_coverage_report(docs, vocab_size=2).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"], out[1]["oov_rate"]) == (4, 0, 0.0)
    assert (out[2]["n_tokens"], out[2]["n_oov"], out[2]["oov_rate"]) == (3, 2, round(2 / 3, 6))
    assert (out[3]["n_tokens"], out[3]["n_oov"], out[3]["oov_rate"]) == (0, 0, None)
    with pytest.raises(ValueError, match="vocab_size"):
        T.vocab_coverage_report(docs, vocab_size=0)


def test_vocab_coverage_broadcasts_vocab(spark):
    df = T.vocab_coverage_report(_docs(spark, [(1, "a b c")]), vocab_size=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the vocab cut is TakeOrdered, not an unpartitioned rank window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
