"""Extended TPC-H-shaped suite (plans/tpch_ext.py) vs the DuckDB oracle
at sf0.001 — the same comparison the driver's correctness gate runs at
sf0.01, kept in-tree so regressions surface in `pytest` first.
"""

import math

import duckdb
import pytest

from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans import tpch_ext

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
]


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(_norm(r[i]) for i in order) for r in rows], key=repr)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tpch_ext.QUERIES))
def test_matches_oracle(spark, sf_dir, oracle, name):
    df = tpch_ext.QUERIES[name](spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    res = oracle.execute(tpch_ext.ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(cols) == sorted(ocols)
    assert len(rows) == len(orows)
    assert _canon(rows, cols) == _canon(orows, ocols)


def test_all_queries_have_oracles():
    assert set(tpch_ext.QUERIES) == set(tpch_ext.ORACLES)


@pytest.mark.parametrize("name", sorted(tpch_ext.QUERIES))
def test_plan_posture(spark, sf_dir, name):
    """Every extended-suite plan stays JVM-side (no Python eval) and
    never falls back to a shuffled cartesian product (broadcast
    nested-loop against 1-row scalar aggregates is the intended shape)."""
    plan = (
        tpch_ext.QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "CartesianProduct"):
        assert marker not in plan, f"{name}: {marker} in plan"
