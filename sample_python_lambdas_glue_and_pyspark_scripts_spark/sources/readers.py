"""Readers (SURVEY.md §2.1 S1-S4, S8).

The reference's gzip pre-decompress Glue job
(/root/reference/src/price_zone/decompress_job.py) is eliminated: Spark
reads ``.csv.gz`` natively. gz is unsplittable, so gz inputs are
repartitioned right after read to restore parallelism (SURVEY.md §2.1 S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_staged(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = True,
    repartition_gz: int | None = None,
) -> DataFrame:
    """S1/S3: CSV scan with an explicit all-string staging schema.

    Mirrors the reference's inference-off, read-as-string discipline
    (transform_spark_job.py:44-48; pa_etl_script.py:104-109 for sep='|').
    """
    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    if repartition_gz and (path.endswith(".gz") or ".gz" in path):
        # S2: gz is unsplittable → one task per file until we repartition.
        df = df.repartition(repartition_gz)
    return df


def read_pipe_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S3: pipe-delimited CSV (reference: pa_etl_script.py:109)."""
    return read_csv_staged(spark, path, schema, sep="|")


# the synthetic-table inventory (TESTDATA.md) — single definition shared
# by bench warmup, the oracle harness, and tests
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Engine-default columnar scan; Catalyst pushes filters/pruning."""
    return spark.read.parquet(path)


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one synthetic table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """S8: DB scan for control tables (reference: load_job.py:171,193,238).

    Control tables are tiny; fact-scale JDBC reads must pass the
    partition_column/bounds quartet to parallelize.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if num_partitions and partition_column is not None:
        reader = (
            reader.option("numPartitions", str(num_partitions))
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()
