"""SQL API surface: run raw Spark SQL over the engine's tables.

The reference has no SQL parser (SURVEY.md intro); the engine inherits
Spark SQL's full surface for free. ``register_tables`` exposes a
directory of parquet tables as temp views so users can
``spark.sql("SELECT ...")`` directly — same Catalyst plans as the
DataFrame API, so every optimization note in PLANS.md applies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def register_tables(
    spark: SparkSession, data_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register ``<data_dir>/<name>.parquet`` files as temp views."""
    if tables is None:
        tables = sorted(
            f[: -len(".parquet")]
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
    for name in tables:
        spark.read.parquet(f"{data_dir}/{name}.parquet").createOrReplaceTempView(name)
    return tables


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
