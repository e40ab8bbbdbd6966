"""Readers (SURVEY.md §2.1 S1-S4, S8).

The reference's gzip pre-decompress Glue job
(/root/reference/src/price_zone/decompress_job.py) is eliminated: Spark
reads ``.csv.gz`` natively. gz is unsplittable, so gz inputs are
repartitioned right after read to restore parallelism (SURVEY.md §2.1 S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


def resolve_sf_dir(default: str) -> str:
    """One data-dir variable for BOTH gates: ``SPARK_GRAFT_SF_DIR`` is
    canonical; the legacy ``SF_DIR`` (which only check_correctness used
    to honor — the CLAUDE.md silently-wrong-sweep footgun) still works
    with a warning. If both are set and disagree, the canonical one
    wins. Always prints the resolved dir so a sweep can't silently run
    against the wrong SF again."""
    import os
    import sys

    canonical = os.environ.get("SPARK_GRAFT_SF_DIR")
    legacy = os.environ.get("SF_DIR")
    if canonical and legacy and canonical != legacy:
        print(
            f"[sf_dir] WARNING: SPARK_GRAFT_SF_DIR={canonical!r} overrides "
            f"legacy SF_DIR={legacy!r}",
            file=sys.stderr,
        )
    if not canonical and legacy:
        print(
            "[sf_dir] WARNING: SF_DIR is the legacy alias; prefer "
            "SPARK_GRAFT_SF_DIR",
            file=sys.stderr,
        )
    resolved = canonical or legacy or default
    print(f"[sf_dir] resolved data dir: {resolved}", file=sys.stderr)
    return resolved


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


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
    repartition_gz: int | None = None,
) -> DataFrame:
    """JSON-lines corpus scan with schema enforcement and corrupt-line
    capture (the standard LLM training-corpus interchange format).

    Same inference-off discipline as the CSV staging readers: an explicit
    schema (inference is a second full pass over 100 TB), PERMISSIVE
    mode, and malformed lines captured into ``corrupt_col`` instead of
    aborting the scan — the JSONL analogue of the reference's
    quarantine-don't-fail validation posture
    (/root/reference/src/price_zone/validator.py). Split the result with
    :func:`split_corrupt`.

    ``multiLine`` stays off (one JSON object per line keeps the input
    splittable — a multiline JSON file is one task no matter its size);
    ``.gz``/``.zst`` inputs are transparently decompressed but
    unsplittable, so the same ``repartition_gz`` lever as the CSV
    readers applies.
    """
    if corrupt_col and corrupt_col not in schema.fieldNames():
        from pyspark.sql.types import StringType, StructField

        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    if repartition_gz and ".gz" in path:
        df = df.repartition(repartition_gz)
    return df


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE scan into (good, quarantine) frames.

    Spark refuses a filter that references ONLY the corrupt-record
    column of an un-materialized JSON scan (the scan would need to run
    just to produce the filter input), so the frame is cached first —
    one scan feeds both halves, which is also the cheaper plan when both
    are consumed (SURVEY.md §4.1's single-pass discipline).
    """
    df = df.cache()
    good = df.filter(df[corrupt_col].isNull()).drop(corrupt_col)
    bad = df.filter(df[corrupt_col].isNotNull())
    return good, bad


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar scan — same Catalyst pruning/pushdown contract as
    :func:`read_parquet` (ORC ships in Spark core; no extra jars)."""
    return spark.read.orc(path)


#: extension → media kind for the binaryFile ingest path
MEDIA_KINDS: dict[str, str] = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "bmp": "image", "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mov": "video", "avi": "video",
}


def read_media_files(spark: SparkSession, path: str, pattern: str | None = None):
    """Raw media ingest via Spark's ``binaryFile`` source: each file
    becomes one row ``(media_path, media_id, kind, n_bytes, payload)``
    ready for ``operators/multimodal.decode_media`` (which wants
    ``media_id``/``kind``/``payload``).

    ``media_id`` is the stable md5-of-path bigint (oracle-parity hash
    recipe), NOT an ingest-order counter — re-runs and late-arriving
    files keep their ids. ``kind`` comes from the extension
    (``MEDIA_KINDS``; unknown → 'other' and the header parser classifies
    by magic bytes downstream).

    Scale notes: binaryFile caps files at
    ``spark.sql.sources.binaryFile.maxLength`` (int max); listing is
    driver-side like every file source — at 100 TB point ``path`` at a
    partitioned prefix, not a flat dir of millions of objects, and use
    ``pattern`` (``pathGlobFilter``) so pruning happens at listing time
    rather than after a full scan.
    """
    r = spark.read.format("binaryFile")
    if pattern:
        r = r.option("pathGlobFilter", pattern)
    df = r.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    kind = F.lit("other")
    for e, k in MEDIA_KINDS.items():
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
    media_id = F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return df.select(
        F.col("path").alias("media_path"),
        media_id.alias("media_id"),
        kind.alias("kind"),
        F.col("length").cast("int").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
