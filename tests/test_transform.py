"""Transform + scalar-function tests (SURVEY.md §2.2, §2.7)."""

import datetime

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark import schemas as S
from sample_python_lambdas_glue_and_pyspark_scripts_spark.functions import (
    classify_file_type,
    split_part,
    str_to_bool,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import transform as T


def test_price_zone_mapping_and_derive(spark):
    raw = spark.createDataFrame(
        [("019", "104612", "5", "1234567", "2020-08-06 10:11:12")],
        S.PRICE_ZONE_STAGING_SCHEMA,
    )
    mapped = T.price_zone_mapping(raw)
    assert mapped.columns == ["opco_id", "supc", "price_zone", "customer_id", "eff_from_dttm"]
    out = T.price_zone_derive(mapped)
    row = out.first()
    assert row["price_zone"] == 5
    assert row["effective_date"] == datetime.datetime(2020, 8, 6, 10, 11, 12)
    assert "eff_from_dttm" not in out.columns


def test_pa_transform_contract(spark):
    raw = spark.createDataFrame(
        [
            (
                "104612",          # ITEM_ID
                "1.00",            # CURRENT_PRICE (dropped)
                "r",               # REASON (dropped)
                "2.00",            # NEW_PRICE (dropped)
                "13.44",           # LOCAL_REFERENCE_PRICE
                "2020-08-06 10:11:12",  # EFFECTIVE_DATE
                "2020-08-07 00:00:00",  # EXPORT_DATE
                "Y",               # ITEM_ATTR_5_NM
                "019-5",           # PRICE_ZONE_ID
            )
        ],
        S.PA_STAGING_SCHEMA,
    )
    out = T.pa_transform(raw)
    # output column-order contract (pa_etl_script.py:264)
    assert out.columns == S.PA_OUTPUT_COLUMNS
    row = out.first()
    assert row["supc"] == "104612"
    assert row["price"] == 13.44
    assert row["effective_date"] == datetime.date(2020, 8, 6)
    # epoch of 2020-08-07 00:00:00 UTC
    assert row["export_date"] == 1596758400
    assert row["opco_id"] == "019"
    assert row["price_zone_id"] == "5"
    assert row["catch_weight_indicator"] == "Y"


def test_pa_transform_decimal_price(spark):
    raw = spark.createDataFrame(
        [("1", "x", "x", "x", "13.445", "2020-08-06", "2020-08-07 00:00:00", "Y", "019-5")],
        S.PA_STAGING_SCHEMA,
    )
    out = T.pa_transform(raw, decimal_price=True)
    assert out.schema["price"].dataType.simpleString() == "decimal(12,2)"
    from decimal import Decimal

    assert out.first()["price"] == Decimal("13.45")  # exact cents, HALF_UP


def test_split_part(spark):
    df = spark.range(1).select(
        split_part(F.lit("019-5"), "-", 0).alias("a"),
        split_part(F.lit("019-5"), "-", 1).alias("b"),
    )
    r = df.first()
    assert (r["a"], r["b"]) == ("019", "5")


def test_classify_file_type(spark):
    # truth table from test_etl_trigger_lambda.py:7-37
    cases = [
        ("ctt_fileName.extension", "partial"),
        ("ITT_other.csv", "partial"),
        ("WTP_20210612_018-file.csv.gz", "full"),
        ("wtp_x.csv", "full"),
        ("fileName.extension", "unknown"),
    ]
    df = spark.createDataFrame(cases, ["name", "expected"]).withColumn(
        "got", classify_file_type("name")
    )
    assert df.filter(F.col("got") != F.col("expected")).count() == 0


def test_partition_key_from_path(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.functions import (
        partition_key_from_path,
    )

    df = spark.createDataFrame(
        [("s3://bucket/etl_output_1/opco_id=019/part-0001.csv",),
         ("file:/x/opco_id=7/f.csv",), ("no-key-here.csv",)],
        ["path"],
    ).select(partition_key_from_path("path").alias("k"))
    assert [r["k"] for r in df.collect()] == ["019", "7", ""]


def test_format_timestamp(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.functions import (
        format_timestamp,
    )
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2020, 8, 6, 10, 11, 12),)], "ts timestamp"
    ).select(format_timestamp("ts").alias("s"))
    assert df.first()["s"] == "2020-08-06 10:11:12"


def test_str_to_bool(spark):
    df = spark.createDataFrame(
        [("true",), ("1",), ("FALSE",), ("0",), ("yes",)], ["v"]
    ).select(str_to_bool("v").alias("b"))
    assert [r["b"] for r in df.collect()] == [True, True, False, False, True]
