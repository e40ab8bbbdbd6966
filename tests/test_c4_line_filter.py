"""C4 line-level cleaning (operators/text.c4_line_filter): rule-by-rule
verdicts per Raffel et al. 2020 §2.2, NULL-as-empty, and plan shape
(pure map-side — no shuffle)."""

import pytest

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    text as T,
)

SCHEMA = "doc_id BIGINT, text STRING"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = T.c4_line_filter(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_line_rules(spark):
    doc = "\n".join(
        [
            "this line stays because it ends well.",
            "no terminal punctuation here",
            "too short.",
            "does this question line survive the filter?",
            'a quoted ending also counts as terminal."',
            "bang endings count as terminal marks too!",
            "a javascript line is dropped even with a period.",
            "",
        ]
    )
    got = _run(spark, [(1, doc)], min_kept_lines=4)[1]
    assert got["n_lines"] == 8
    assert got["n_kept_lines"] == 4
    assert got["text_clean"].split("\n") == [
        "this line stays because it ends well.",
        "does this question line survive the filter?",
        'a quoted ending also counts as terminal."',
        "bang endings count as terminal marks too!",
    ]
    assert got["rule_min_lines"] and got["keep"]


def test_doc_rules(spark):
    keep_line = "three words suffice here."
    base = "\n".join([keep_line] * 5)
    rows = [
        (1, base),
        (2, base + "\nLorem Ipsum dolor sit."),
        (3, base + "\nvar x = {1};"),
        (4, base.replace(".", "")),  # nothing kept
        (5, None),
    ]
    got = _run(spark, rows)
    assert got[1]["keep"]
    assert not got[2]["rule_no_blockdoc"] and not got[2]["keep"]
    assert not got[3]["rule_no_brace"] and not got[3]["keep"]
    # but their LINE filtering still ran (the lorem line itself ends
    # in '.' with >=3 words, so it passes the LINE rules)
    assert got[2]["n_kept_lines"] == 6
    assert got[4]["n_kept_lines"] == 0 and not got[4]["rule_min_lines"]
    assert got[5]["n_lines"] == 1 and got[5]["n_kept_lines"] == 0
    assert got[5]["text_clean"] == "" and not got[5]["keep"]


def test_kept_frac_guard(spark):
    doc = "good line stays here.\nbad\nbad\nbad"
    got = _run(spark, [(1, doc)], min_kept_lines=1, min_kept_frac=0.5)[1]
    assert got["kept_frac"] == 0.25
    assert not got["rule_kept_frac"] and not got["keep"]
    got2 = _run(spark, [(1, doc)], min_kept_lines=1, min_kept_frac=0.25)[1]
    assert got2["rule_kept_frac"] and got2["keep"]


def test_trailing_whitespace_and_empty_doc(spark):
    got = _run(
        spark,
        [(1, "ends with spaces after period.   \nplain"), (2, "")],
        min_kept_lines=1,
    )
    assert got[1]["n_kept_lines"] == 1 and got[1]["keep"]
    assert got[2]["n_lines"] == 1 and got[2]["n_kept_lines"] == 0


def test_map_side_plan(spark):
    df = spark.createDataFrame([(1, "a b c.")], SCHEMA)
    plan = T.c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "x.")], SCHEMA)
    with pytest.raises(ValueError):
        T.c4_line_filter(df, min_line_words=-1)
