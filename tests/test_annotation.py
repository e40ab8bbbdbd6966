"""Annotation/label-QA operators: consensus + Fleiss' kappa."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    annotation as AN,
)


def test_consensus_majority_ties_and_dedup(spark):
    rows = [
        # item 1: b wins 2-1
        (1, "r1", "b"), (1, "r2", "b"), (1, "r3", "a"),
        # item 2: tie a/b -> lexicographically smallest (a)
        (2, "r1", "a"), (2, "r2", "b"),
        # item 3: duplicate submission collapses; single rater
        (3, "r1", "c"), (3, "r1", "c"),
        # NULLs drop
        (None, "r1", "a"), (4, None, "a"), (4, "r1", None),
    ]
    df = spark.createDataFrame(rows, "item BIGINT, ann STRING, lab STRING")
    out = {
        r["item"]: (r["label"], r["n_votes"], r["n_ratings"])
        for r in AN.consensus_labels(df, "item", "ann", "lab").collect()
    }
    assert out == {1: ("b", 2, 3), 2: ("a", 1, 2), 3: ("c", 1, 1)}


def test_fleiss_kappa_regimes(spark):
    """Perfect agreement -> kappa 1; systematic disagreement on a
    2-label/2-rater table -> kappa < 0; the Fleiss 1971 worked example
    reproduces at 6dp."""
    perfect = spark.createDataFrame(
        [(i, r, "x" if i % 2 else "y") for i in range(4) for r in ("a", "b")],
        "item BIGINT, ann STRING, lab STRING",
    )
    row = AN.fleiss_kappa_report(perfect, "item", "ann", "lab").first()
    assert row["kappa"] == 1.0 and row["p_bar"] == 1.0
    assert row["n_items"] == 4 and row["n_ratings"] == 8

    disagree = spark.createDataFrame(
        [(i, "a", "x") for i in range(4)] + [(i, "b", "y") for i in range(4)],
        "item BIGINT, ann STRING, lab STRING",
    )
    row = AN.fleiss_kappa_report(disagree, "item", "ann", "lab").first()
    assert row["p_bar"] == 0.0 and row["kappa"] < 0

    # Fleiss 1971 example (14 raters, 10 items, 5 categories): kappa
    # = 0.209931 at 6dp (published rounding: 0.210)
    table = [
        (0, 0, 0, 0, 14), (0, 2, 6, 4, 2), (0, 0, 3, 5, 6),
        (0, 3, 9, 2, 0), (2, 2, 8, 1, 1), (7, 7, 0, 0, 0),
        (3, 2, 6, 3, 0), (2, 5, 3, 2, 2), (6, 5, 2, 1, 0),
        (0, 2, 2, 3, 7),
    ]
    rows = []
    for i, counts in enumerate(table):
        rid = 0
        for j, c in enumerate(counts):
            for _ in range(c):
                rows.append((i, f"r{rid}", f"c{j}"))
                rid += 1
    df = spark.createDataFrame(rows, "item BIGINT, ann STRING, lab STRING")
    row = AN.fleiss_kappa_report(df, "item", "ann", "lab").first()
    assert row["n_items"] == 10 and row["n_ratings"] == 140
    assert row["kappa"] == 0.209931


def test_fleiss_kappa_excludes_single_rating_items(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (2, "a", "y")],
        "item BIGINT, ann STRING, lab STRING",
    )
    row = AN.fleiss_kappa_report(df, "item", "ann", "lab").first()
    # item 2 (one rating) must not count anywhere: 1 item, 2 ratings,
    # both x -> p_e = 1 exactly; kappa is NULL (0/0 guard by division)
    assert row["n_items"] == 1 and row["n_ratings"] == 2
    assert row["p_bar"] == 1.0 and row["p_e"] == 1.0
    assert row["kappa"] is None


def test_bradley_terry_orders_strengths_and_counts(spark):
    """a beats b beats c transitively -> strengths order a > b > c;
    the counted form equals the exploded form; never-winners land at
    the documented 0 fixed point; self-pairs and NULLs drop."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("b", "c"), ("a", "c"),
         ("a", "a"), (None, "b"), ("a", None)],
        "winner STRING, loser STRING",
    )
    out = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_strengths(pairs).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert out["a"] > out["b"] > out["c"] == 0.0
    counted = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 2), ("a", "c", 1)],
        "winner STRING, loser STRING, n BIGINT",
    )
    out2 = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_strengths(counted, count_col="n").collect()
    }
    assert out == out2
    with pytest.raises(ValueError, match="n_iter"):
        AN.bradley_terry_strengths(pairs, n_iter=0)


def test_bradley_terry_balanced_is_uniform(spark):
    """A perfectly balanced rock-paper-scissors cycle has no preference
    signal: every strength is exactly 1 at every iteration count."""
    pairs = spark.createDataFrame(
        [("r", "s"), ("s", "p"), ("p", "r")], "winner STRING, loser STRING"
    )
    for it in (1, 3):
        out = {
            r["item"]: r["strength"]
            for r in AN.bradley_terry_strengths(pairs, n_iter=it).collect()
        }
        assert out == {"r": 1.0, "s": 1.0, "p": 1.0}
