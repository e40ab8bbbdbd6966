"""Small-file compaction (SURVEY.md §7.1 M7).

Partitioned sinks accumulate small files (per-trigger streaming appends,
per-opco incremental loads). Small files poison scan parallelism setup
cost and NameNode/listing overhead at 100 TB. ``compact_partitioned``
rewrites a hive-partitioned dataset with size-targeted files per
partition, preserving partition values.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_by: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Rewrite ``path`` with ~target-sized files per partition.

    Files-per-partition is derived from current on-disk bytes; the
    rewrite goes through a temp dir then swaps, so readers never see a
    half-compacted dataset. Returns {files_before, files_after}.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(
        jvm.java.net.URI.create(path), hconf
    )
    Path = jvm.org.apache.hadoop.fs.Path

    def stats(p: str) -> tuple[int, int]:
        it = fs.listFiles(Path(p), True)
        n = b = 0
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not name.startswith("_"):
                n += 1
                b += st.getLen()
        return n, b

    files_before, total_bytes = stats(path)
    df = spark.read.format(fmt).load(path)
    n_partitions = max(
        1, df.select(partition_by).distinct().count()
    )
    files_per_partition = max(1, round(total_bytes / n_partitions / target_file_bytes))

    tmp = path.rstrip("/") + "__compact"
    # repartition on (partition key, salt): hashing on the key alone puts
    # each partition value in ONE task, so a hot partition could never be
    # split into multiple target-sized files
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_partition))
    (
        df.withColumn("__salt", salt)
        .repartition(n_partitions * files_per_partition, F.col(partition_by), F.col("__salt"))
        .drop("__salt")
        .write.partitionBy(partition_by)
        .mode("overwrite")
        .format(fmt)
        .save(tmp)
    )
    old = path.rstrip("/") + "__old"
    # rename returns False on failure (it rarely throws): pre-clean any
    # stale backup from a crashed run, check each step, and restore the
    # original on a failed promote — never delete data we can't replace.
    fs.delete(Path(old), True)
    if not fs.rename(Path(path), Path(old)):
        fs.delete(Path(tmp), True)
        raise RuntimeError(f"compaction swap failed: cannot move {path} aside")
    if not fs.rename(Path(tmp), Path(path)):
        fs.rename(Path(old), Path(path))  # restore original dataset
        raise RuntimeError(f"compaction swap failed: cannot promote {tmp}")
    fs.delete(Path(old), True)
    files_after, _ = stats(path)
    return {"files_before": files_before, "files_after": files_after}
