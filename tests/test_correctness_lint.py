"""Regression tests for tools/check_correctness.py's dtype lint — the
local predictor of the driver's type-aware hash."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from pyspark.sql import types as T

from check_correctness import _duck_kind, _spark_kind, dtype_lint


def _schema(**cols):
    m = {
        "int32": T.IntegerType(),
        "int64": T.LongType(),
        "float": T.DoubleType(),
        "str": T.StringType(),
    }
    return T.StructType([T.StructField(n, m[k]) for n, k in cols.items()])


def test_int_widths_are_distinct_kinds():
    assert _duck_kind("INTEGER") == "int32"
    assert _duck_kind("BIGINT") == "int64"
    assert _spark_kind("int") == "int32"
    assert _spark_kind("bigint") == "int64"
    assert _duck_kind("HUGEINT") == "hugeint"


def test_width_mismatch_is_flagged():
    # DuckDB INTEGER vs Spark BIGINT: passes a width-blind lint, fails
    # the driver's type-aware hash — must be caught locally
    msgs = dtype_lint(_schema(n="int64"), ["n"], ["INTEGER"])
    assert len(msgs) == 1 and "int32" in msgs[0] and "int64" in msgs[0]
    assert dtype_lint(_schema(n="int64"), ["n"], ["BIGINT"]) == []
    assert dtype_lint(_schema(n="int32"), ["n"], ["INTEGER"]) == []


def test_hugeint_still_flagged_with_cast_hint():
    msgs = dtype_lint(_schema(s="int64"), ["s"], ["HUGEINT"])
    assert len(msgs) == 1 and "CAST" in msgs[0]
