"""Declarative schemas + constraint constants.

The reference reads everything as *string* with inference off and asserts
types via its validation suite before casting
(/root/reference/src/price_zone/transform_spark_job.py:44-48,78,81).
We keep that read-as-string-then-validated-cast discipline: staging
schemas are all-string; final schemas are typed.

Constraint constants mirror /root/reference/src/price_zone/constants.py:1-9
(values are data contracts pinned by the reference test corpus, e.g.
test/price_zone/test_date_format_regex.py).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- constraint constants (reference: src/price_zone/constants.py:1-9) -----
CUST_NBR_LENGTH = 14
CO_NBR_LENGTH = 3
SUPC_LENGTH = 9
PRICE_ZONE_MIN_VALUE = 1
PRICE_ZONE_MAX_VALUE = 5
# Calendar-ish bounds: month 01-12, day 01-31, HH<24, MM/SS<60, optional
# fractional seconds. Stricter than to_timestamp alone; true calendar
# validity (e.g. Feb 30) is caught by the parse-null rule (SURVEY.md §2.3 F7).
DATE_FORMAT_REGEX = (
    r"^([0-9]{4})-(1[0-2]|0[1-9])-(3[01]|0[1-9]|[12][0-9]) "
    r"(2[0-3]|[01][0-9]):([0-5][0-9]):([0-5][0-9])(.([0-9])+)?$"
)
INPUT_DATE_FORMAT = "yyyy-MM-dd HH:mm:ss"
OUTPUT_DATE_FORMAT = "yyyy-MM-dd HH:mm:ss"

# --- price_zone input (reference: transform_spark_job.py:54-59) ------------
# Raw source columns (co_nbr, supc, prc_zone, cust_nbr, eff_from_dttm) are
# renamed at ingest to the canonical names every validator test uses.
PRICE_ZONE_RAW_COLUMNS = ["co_nbr", "supc", "prc_zone", "cust_nbr", "eff_from_dttm"]
PRICE_ZONE_RENAMES = {
    "co_nbr": "opco_id",
    "prc_zone": "price_zone",
    "cust_nbr": "customer_id",
}

PRICE_ZONE_STAGING_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in PRICE_ZONE_RAW_COLUMNS]
)

PRICE_ZONE_FINAL_SCHEMA = StructType(
    [
        StructField("opco_id", StringType(), True),
        StructField("supc", StringType(), True),
        StructField("price_zone", IntegerType(), True),
        StructField("customer_id", StringType(), True),
        StructField("effective_date", TimestampType(), True),
    ]
)

# --- PA input (reference: src/pa/pa_etl_script.py:109,241-264) --------------
PA_RAW_COLUMNS = [
    "ITEM_ID",
    "CURRENT_PRICE",
    "REASON",
    "NEW_PRICE",
    "LOCAL_REFERENCE_PRICE",
    "EFFECTIVE_DATE",
    "EXPORT_DATE",
    "ITEM_ATTR_5_NM",
    "PRICE_ZONE_ID",
]
PA_STAGING_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in PA_RAW_COLUMNS]
)
# Output column order contract (pa_etl_script.py:264)
PA_OUTPUT_COLUMNS = [
    "supc",
    "effective_date",
    "price",
    "export_date",
    "catch_weight_indicator",
    "price_zone_id",
    "opco_id",
]

# --- synthetic testdata tables (TESTDATA.md) --------------------------------
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)
