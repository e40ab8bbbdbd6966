"""Sinks (SURVEY.md §2.1 S5-S7, S10).

Scale notes:
- ``write_partitioned`` repartitions by the partition key before
  ``partitionBy`` so each output partition is written by few tasks
  (avoids the tasks x partitions small-file explosion; SURVEY.md §4.1).
- JDBC writes throttle with ``numPartitions`` — the engine equivalent of
  the reference's DB semaphore + connection pool
  (O2/O7, /root/reference/src/AnalyzeWaitOrLoadClusterLambda/index.py:15-17,
   load_job.py:389-397).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] = "opco_id",
    fmt: str = "parquet",
    mode: str = "overwrite",
    quote_disabled: bool = True,
    coalesce_per_partition: bool = True,
) -> None:
    """S5: hive-partitioned sink (reference: transform_spark_job.py:107-111).

    Engine default is parquet; fmt='csv' reproduces the reference's sink,
    including its disabled quoting (``quoteChar: -1`` →
    ``option("quote", "")``; SURVEY.md §7.2). The partition column is not
    written into the files — same contract as the reference's per-group
    sink (pa_etl_script.py:124).
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    out = df.repartition(*keys) if coalesce_per_partition else df
    writer = out.write.mode(mode).partitionBy(*keys)
    if fmt == "csv":
        writer = writer.option("header", "true")
        if quote_disabled:
            writer = writer.option("quote", "")
        writer.csv(path)
    elif fmt == "orc":
        # columnar alternative with the same pruning/pushdown contract as
        # parquet (both are tested for partition pruning + predicate
        # pushdown in test_sources/test_layout)
        writer.orc(path)
    else:
        writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    num_partitions: int = 5,
    properties: dict[str, str] | None = None,
    batch_size: int = 10000,
) -> None:
    """S7: bulk DB load (reference: load_job.py:74-90 LOAD DATA FROM S3).

    ``num_partitions`` caps concurrent connections — replacing the
    reference's QueuePool(pool_size=5) + cluster semaphore. REPLACE-INTO
    upsert semantics need a staged MERGE on the target DB (documented
    deviation, SURVEY.md §7.2); v1 supports append/overwrite.
    """
    (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**(properties or {}))
        .mode(mode)
        .save()
    )


def upsert_statement_sql(
    url: str,
    table: str,
    staging: str,
    cols: list[str],
    keys: list[str],
) -> str:
    """The single atomic upsert statement ``jdbc_merge_upsert`` executes
    in the target DB, selected by JDBC URL dialect:

    - ``jdbc:mysql:`` / ``jdbc:mariadb:`` →
      ``INSERT INTO target (..) SELECT .. FROM staging s ON DUPLICATE
      KEY UPDATE col = s.col, ..`` — the reference's actual Aurora
      MySQL sink semantics (``LOAD DATA .. REPLACE`` keyed overwrite,
      load_job.py:74-90) in its modern non-deprecated form (column
      references into the SELECT source, not the removed ``VALUES()``
      function). MySQL resolves the duplicate through the target's
      PRIMARY/UNIQUE key, so the target's key must cover ``keys`` —
      same contract as the reference's PK. Key-only tables degrade to a
      self-assign no-op update (MySQL requires an UPDATE clause).
    - anything else → ANSI ``MERGE INTO .. USING .. ON .. WHEN
      [NOT] MATCHED`` (Derby >= 10.11, Postgres 15+, Oracle, etc.) —
      live-tested against embedded Derby.
    """
    non_keys = [c for c in cols if c not in keys]
    insert_cols = ", ".join(cols)
    dialect = url.split(":", 2)[1].lower() if url.count(":") >= 2 else ""
    if dialect in ("mysql", "mariadb"):
        select_cols = ", ".join(f"s.{c}" for c in cols)
        updates = (
            ", ".join(f"{c} = s.{c}" for c in non_keys)
            if non_keys
            else f"{keys[0]} = {keys[0]}"
        )
        return (
            f"INSERT INTO {table} ({insert_cols}) "
            f"SELECT {select_cols} FROM {staging} s "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    insert_vals = ", ".join(f"s.{c}" for c in cols)
    matched = (
        "WHEN MATCHED THEN UPDATE SET "
        + ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        + " "
        if non_keys
        else ""
    )
    return (
        f"MERGE INTO {table} t USING {staging} s ON ({on}) "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )


def jdbc_merge_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    staging_table: str | None = None,
    properties: dict[str, str] | None = None,
    num_partitions: int = 5,
    batch_size: int = 10000,
    staging_column_types: str | None = None,
    drop_staging: bool = True,
) -> None:
    """S7 full fidelity: REPLACE-by-key executed INSIDE the target DB.

    The reference's ``LOAD DATA FROM S3 ... REPLACE INTO TABLE``
    (load_job.py:74-90) is an in-database keyed overwrite — readers of
    the target table never observe a half-replaced state. The relational
    ``operators.upsert.merge_upsert`` + write-then-promote staging gets
    the same FINAL contents but exposes an overwrite window while the
    target is rewritten. This sink closes that gap:

    1. bulk-write ``df`` into a staging table (the only distributed
       step — same connection-capped JDBC writer as :func:`write_jdbc`);
    2. execute ONE upsert statement over a single JDBC connection
       (opened with the same ``properties`` auth/connection options as
       the staging write) — dialect chosen by URL via
       :func:`upsert_statement_sql`: ANSI ``MERGE INTO`` for Derby/
       Postgres/Oracle-style targets (live-tested against Derby),
       ``INSERT .. SELECT .. ON DUPLICATE KEY UPDATE`` for
       ``jdbc:mysql:``/``jdbc:mariadb:`` — the reference's actual
       Aurora MySQL REPLACE-by-key semantics. Either way one atomic
       statement in the target DB, so concurrent readers see either
       the old or the new rows, never a half-replaced window;
    3. drop the staging table (best-effort, ``drop_staging=False`` keeps
       it for audit).

    ``keys`` must uniquely identify source rows (MERGE's cardinality
    rule; the reference's PRIMARY KEY gives the same guarantee) — checked
    with one aggregate before any DB write. The target table must exist
    with UNQUOTED (case-insensitive) column identifiers — i.e. ordinary
    DDL, like the reference's DBA-created MySQL tables; the staging
    frame's columns are upper-cased on write so the unquoted MERGE text
    binds on both sides.
    """
    if not keys:
        raise ValueError("jdbc_merge_upsert needs at least one key column")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"key columns not in frame: {missing}")
    from pyspark.sql import functions as F

    dup = (
        df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "jdbc_merge_upsert: source has duplicate merge keys — MERGE's "
            "cardinality rule (and the reference's PRIMARY KEY) require "
            "unique keys; pre-aggregate or dedup the source"
        )

    staging = staging_table or f"{table}_MERGE_STAGE"
    props = dict(properties or {})
    if staging_column_types:
        props["createTableColumnTypes"] = staging_column_types
    # Spark's JDBC writer QUOTES column names at CREATE (case-sensitive
    # in Derby/Postgres), while DBA-created targets use unquoted DDL
    # (folded to upper). Upper-case the staging frame so its quoted
    # names bind to the same identifiers the unquoted MERGE text below
    # resolves to — both sides of the statement then see plain
    # case-insensitive SQL identifiers.
    df = df.toDF(*[c.upper() for c in df.columns])
    write_jdbc(
        df, url, staging, mode="overwrite", num_partitions=num_partitions,
        properties=props, batch_size=batch_size,
    )

    merge_sql = upsert_statement_sql(
        url, table, staging, df.columns, [k.upper() for k in keys]
    )

    spark = df.sparkSession
    driver = props.get("driver")
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    # the MERGE connection must carry the same auth/connection options
    # as the staging bulk write (user/password at minimum) — only
    # Spark-writer-specific keys make no sense on a raw JDBC connection
    jprops = jvm.java.util.Properties()
    # Spark JDBC option keys are case-INSENSITIVE ('batchSize' ≡
    # 'batchsize'), so the skip filter must compare case-folded or a
    # camelCase spelling leaks into DriverManager properties
    skip = {"driver", "createtablecolumntypes", "batchsize", "numpartitions"}
    for k, v in props.items():
        if k.lower() not in skip:
            jprops.setProperty(k, str(v))
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(merge_sql)  # one statement: atomic in the DB
            if drop_staging:
                try:
                    stmt.executeUpdate(f"DROP TABLE {staging}")
                except Exception:
                    pass  # best-effort cleanup; staging is inert
        finally:
            stmt.close()
    finally:
        conn.close()


def append_run_metrics(df: DataFrame, path: str) -> None:
    """S10: structured run ledger replacing the reference's append-to-JSON
    metadata log (metadata_aggregator.py:7-34)."""
    df.write.mode("append").parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: str | list[str] | None = None,
) -> None:
    """JSON-lines corpus sink (one object per line, splittable unless
    compressed with a non-splittable codec — prefer uncompressed or
    zstd-framed for re-read parallelism at scale)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        keys = (
            [partition_by]
            if isinstance(partition_by, str)
            else list(partition_by)
        )
        writer = writer.partitionBy(*keys)
    writer.json(path)
