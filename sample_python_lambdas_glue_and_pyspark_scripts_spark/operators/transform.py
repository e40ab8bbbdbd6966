"""Projection / rename / cast / derive transforms (SURVEY.md §2.2).

Two reference pipelines re-expressed as pure DataFrame functions:
- price_zone transform (transform_spark_job.py:54-104): ApplyMapping
  rename+project, int cast, timestamp derive, column drop.
- PA transform (pa_etl_script.py:241-264): column drops, renames, date /
  epoch parses, PRICE_ZONE_ID split, output-order contract.

All reference pandas ``.apply`` lambdas become native column functions
(whole-stage codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from .. import schemas as S
from ..functions import (
    date_part_to_date,
    datetime_to_epoch,
    parse_timestamp_lenient,
    split_part,
)


def apply_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1: project+rename keeping exactly the mapped columns (implicit drop).

    Reference: Glue ApplyMapping (transform_spark_job.py:54-59).
    """
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def price_zone_mapping(df: DataFrame) -> DataFrame:
    """The reference's exact 5-column mapping (transform_spark_job.py:54-59)."""
    return apply_mapping(
        df,
        {
            "co_nbr": "opco_id",
            "supc": "supc",
            "prc_zone": "price_zone",
            "cust_nbr": "customer_id",
            "eff_from_dttm": "eff_from_dttm",
        },
    )


def price_zone_derive(df: DataFrame) -> DataFrame:
    """P4+P5+P2: cast price_zone to int, derive effective_date, drop raw.

    Reference: transform_spark_job.py:78,81,100-101.
    """
    return (
        df.withColumn("price_zone", F.col("price_zone").try_cast(IntegerType()))
        .withColumn(
            "effective_date",
            parse_timestamp_lenient(F.col("eff_from_dttm"), S.INPUT_DATE_FORMAT),
        )
        .drop("eff_from_dttm")
    )


def pa_transform(df: DataFrame, decimal_price: bool = False) -> DataFrame:
    """The PA pipeline's pandas plan, as one lazy Spark projection.

    Reference: pa_etl_script.py:241-264 —
      drop CURRENT_PRICE/REASON/NEW_PRICE (243-245), rename (249-251,259-260),
      date-part parse (253-254), epoch (255), PRICE_ZONE_ID split (256-257),
      drop PRICE_ZONE_ID (261), output order contract (264).

    ``decimal_price=True`` types price as DECIMAL(12,2) instead of the
    reference's float — the money-correctness upgrade SURVEY §1.2 flags
    (exact cents arithmetic; no binary-float drift in sums).
    """
    price_type = "decimal(12,2)" if decimal_price else "double"
    return df.select(
        F.col("ITEM_ID").alias("supc"),
        date_part_to_date("EFFECTIVE_DATE").alias("effective_date"),
        F.col("LOCAL_REFERENCE_PRICE").try_cast(price_type).alias("price"),
        datetime_to_epoch("EXPORT_DATE").alias("export_date"),
        F.col("ITEM_ATTR_5_NM").alias("catch_weight_indicator"),
        split_part("PRICE_ZONE_ID", "-", 1).alias("price_zone_id"),
        split_part("PRICE_ZONE_ID", "-", 0).alias("opco_id"),
    ).select(*S.PA_OUTPUT_COLUMNS)


def reorder(df: DataFrame, columns: list[str]) -> DataFrame:
    """P8: enforce an output column-order contract (pa_etl_script.py:264)."""
    return df.select(*columns)
