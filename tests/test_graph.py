"""PageRank operator tests (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.graph import (
    pagerank,
)


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # 2-cycle: symmetry forces equal ranks at every iteration; with all
    # mass recirculating they stay at the uniform 0.5
    e = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    r = _ranks(pagerank(e, n_iter=5))
    assert r[1] == r[2] == pytest.approx(0.5, abs=1e-6)


def test_pagerank_star_center_dominates(spark):
    # leaves all point at the center: center accumulates, leaves decay
    e = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)] + [(0, 1)], ["src", "dst"]
    )
    r = _ranks(pagerank(e, n_iter=3))
    assert all(r[0] > r[i] for i in range(1, 5))  # center highest
    # node 1 alone receives the center's back-edge mass; pure leaves
    # only get the teleport base and tie
    assert r[1] > r[2] == r[3] == r[4]


def test_pagerank_dangling_mass_is_lost_not_crashed(spark):
    # 1 -> 2, 2 has no out-edges: total mass shrinks below 1 (lost-mass
    # formulation) but node 2 still outranks node 1
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    r = _ranks(pagerank(e, n_iter=3))
    assert r[2] > r[1]
    assert sum(r.values()) < 1.0


def test_pagerank_weighted_edges_shift_mass(spark):
    # 1 splits 9:1 between 2 and 3 -> rank(2) > rank(3)
    e = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    r = _ranks(pagerank(e, "src", "dst", "w", n_iter=4))
    assert r[2] > r[3]


def test_pagerank_bad_args(spark):
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(e, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(e.filter(F.lit(False)))
