"""Extended TPC-H-shaped suite (plans/tpch_ext.py) vs the DuckDB oracle
at sf0.001 — the same comparison the driver's correctness gate runs at
sf0.01, kept in-tree so regressions surface in `pytest` first.
"""

import duckdb
import pytest

# one canonical comparator: the same normalization the local gate uses
from tools.check_correctness import canon as _canon_gate

from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans import tpch_ext

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
]


def _canon(rows, cols):
    return _canon_gate(rows, cols)


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
