"""Privacy / re-identification QA operators (operators/privacy.py):
k-anonymity census, below-k suppression, distinct l-diversity."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    privacy as PV,
)

SCH = "zip STRING, age INT, diag STRING"
ROWS = [
    # class (90210, 30): 3 rows, two diagnoses
    ("90210", 30, "flu"), ("90210", 30, "flu"), ("90210", 30, "cold"),
    # class (90210, 40): 1 row -> below k=2, re-identifiable
    ("90210", 40, "flu"),
    # class (10001, 30): 2 rows, UNIFORM diagnosis -> l-diversity hole
    ("10001", 30, "covid"), ("10001", 30, "covid"),
    # NULL zip is a linkable value: its own class of 2
    (None, 50, "flu"), (None, 50, None),
]


def test_k_anonymity_report_hand_census(spark):
    df = spark.createDataFrame(ROWS, SCH)
    r = PV.k_anonymity_report(df, ["zip", "age"], k=2).first()
    assert (r["k"], r["n_rows"], r["n_classes"]) == (2, 8, 4)
    assert r["min_class_size"] == 1
    assert r["n_rows_below_k"] == 1 and r["pct_rows_below_k"] == 0.125

    # k=1 is always satisfied
    r1 = PV.k_anonymity_report(df, ["zip", "age"], k=1).first()
    assert r1["n_rows_below_k"] == 0

    # empty table: 0 classes, NULL min/pct (not 'anonymous')
    r0 = PV.k_anonymity_report(df.limit(0), ["zip", "age"], k=2).first()
    assert r0["n_classes"] == 0 and r0["min_class_size"] is None
    assert r0["pct_rows_below_k"] is None

    with pytest.raises(ValueError, match="k must"):
        PV.k_anonymity_report(df, ["zip"], k=0)
    with pytest.raises(ValueError, match="qi_cols"):
        PV.k_anonymity_report(df, [], k=2)


def test_suppress_below_k_makes_table_anonymous(spark):
    df = spark.createDataFrame(ROWS, SCH)
    out = PV.suppress_below_k(df, ["zip", "age"], k=2)
    assert out.columns == df.columns  # original column order preserved
    # removed exactly the census's below-k rows
    assert out.count() == 8 - 1
    # the singleton class is gone, the NULL-keyed class SURVIVES
    kept = {(r["zip"], r["age"]) for r in out.collect()}
    assert ("90210", 40) not in kept and (None, 50) in kept
    # the suppressed table is k-anonymous by construction
    r = PV.k_anonymity_report(out, ["zip", "age"], k=2).first()
    assert r["n_rows_below_k"] == 0 and r["min_class_size"] >= 2


def test_l_diversity_report_hand_census(spark):
    df = spark.createDataFrame(ROWS, SCH)
    # qi = zip alone: classes 90210 (flu/cold -> 2), 10001 (covid -> 1),
    # NULL (flu + NULL-as-value -> 2)
    r = PV.l_diversity_report(df, ["zip"], "diag", l=2).first()
    assert (r["l"], r["n_classes"]) == (2, 3)
    assert r["min_distinct_sensitive"] == 1
    assert r["n_classes_below_l"] == 1
    assert r["pct_classes_below_l"] == 0.333333

    with pytest.raises(ValueError, match="l must"):
        PV.l_diversity_report(df, ["zip"], "diag", l=0)
