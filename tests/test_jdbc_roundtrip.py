"""S7/S8 live-DB leg: JDBC round-trip against embedded Derby.

The reference's DB path is ``LOAD DATA FROM S3 ... REPLACE INTO TABLE``
(/root/reference/src/price_zone/load_job.py:74-90) plus control-table
scans (load_job.py:171,193,238). Spark ships Derby jars, so the engine's
``write_jdbc`` / ``read_jdbc_table`` are exercised against a real JDBC
endpoint (in-memory, same JVM) with no network: write → read-back → and
the REPLACE upsert expressed as merge_upsert staged through the DB.
"""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.upsert import (
    merge_upsert,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.readers import (
    read_jdbc_table,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
    write_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
PROPS = {"driver": DRIVER}


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark):
    if not _derby_available(spark):
        pytest.skip("Derby embedded driver not on the Spark classpath")
    return "jdbc:derby:memory:graftdb;create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "019", 2.5), (2, "021", 7.0), (3, "019", 1.25)],
        "k int, opco string, price double",
    )
    write_jdbc(
        df,
        derby_url,
        "ROUNDTRIP",
        mode="overwrite",
        properties={**PROPS, "createTableColumnTypes": "k INT, opco VARCHAR(8), price DOUBLE"},
    )
    back = read_jdbc_table(spark, derby_url, "ROUNDTRIP", properties=PROPS)
    assert sorted(back.collect()) == sorted(df.collect())


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_jdbc(df, derby_url, "PARTED", mode="overwrite", properties=PROPS)
    back = read_jdbc_table(
        spark,
        derby_url,
        "PARTED",
        properties=PROPS,
        num_partitions=4,
        partition_column="k",
        lower_bound=0,
        upper_bound=100,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_jdbc_replace_upsert_through_db(spark, derby_url):
    """REPLACE INTO semantics staged through the DB: existing keyed rows
    are replaced wholesale, unmatched target rows survive, new keys
    insert — checked on the actual JDBC table contents, matching
    load_job.py:74-90's MySQL REPLACE behavior."""
    types = "k INT, payload VARCHAR(16)"
    target = spark.createDataFrame(
        [(1, "old-1"), (2, "old-2"), (3, "old-3")], "k int, payload string"
    )
    write_jdbc(
        target, derby_url, "UPSERT_T", mode="overwrite",
        properties={**PROPS, "createTableColumnTypes": types},
    )

    source = spark.createDataFrame(
        [(2, "new-2"), (4, "new-4")], "k int, payload string"
    )
    current = read_jdbc_table(spark, derby_url, "UPSERT_T", properties=PROPS)
    merged = merge_upsert(current, source, keys=["k"])
    # JDBC reads are lazy: overwriting UPSERT_T straight from a plan that
    # reads UPSERT_T would drop the rows before scanning them. Stage the
    # merge in a second table, then promote — the reference's
    # load-to-staging-then-swap discipline (load_job.py ACTIVE/FUTURE).
    write_jdbc(
        merged, derby_url, "UPSERT_STAGE", mode="overwrite",
        properties={**PROPS, "createTableColumnTypes": types},
    )
    staged = read_jdbc_table(spark, derby_url, "UPSERT_STAGE", properties=PROPS)
    write_jdbc(
        staged, derby_url, "UPSERT_T", mode="overwrite",
        properties={**PROPS, "createTableColumnTypes": types},
    )

    final = {
        (r["k"], r["payload"])
        for r in read_jdbc_table(spark, derby_url, "UPSERT_T", properties=PROPS).collect()
    }
    assert final == {(1, "old-1"), (2, "new-2"), (3, "old-3"), (4, "new-4")}


def test_jdbc_merge_into_upsert_in_db(spark, derby_url):
    """S7 full fidelity: the keyed REPLACE runs as ONE MERGE statement
    inside the DB — matched keys update in place, new keys insert,
    unmatched target rows survive, and the staging table is dropped."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
        jdbc_merge_upsert,
    )

    types = "k INT, payload VARCHAR(16)"
    # target created like the reference's: plain DDL, unquoted columns
    spark._jvm.java.lang.Class.forName(DRIVER)
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby_url)
    try:
        st = conn.createStatement()
        st.executeUpdate("CREATE TABLE MERGE_T (k INT, payload VARCHAR(16))")
        st.executeUpdate(
            "INSERT INTO MERGE_T VALUES (1, 'old-1'), (2, 'old-2'), (3, 'old-3')"
        )
        st.close()
    finally:
        conn.close()
    source = spark.createDataFrame(
        [(2, "new-2"), (4, "new-4")], "k int, payload string"
    )
    jdbc_merge_upsert(
        source, derby_url, "MERGE_T", keys=["k"],
        properties=PROPS, staging_column_types=types,
    )
    final = {
        tuple(r) # DDL-created table: unquoted (upper-cased) column names
        for r in read_jdbc_table(spark, derby_url, "MERGE_T", properties=PROPS).collect()
    }
    assert final == {(1, "old-1"), (2, "new-2"), (3, "old-3"), (4, "new-4")}
    # staging dropped
    with pytest.raises(Exception):
        read_jdbc_table(
            spark, derby_url, "MERGE_T_MERGE_STAGE", properties=PROPS
        ).collect()


def test_jdbc_merge_failure_leaves_target_untouched(spark, derby_url):
    """Concurrent-read consistency: a MERGE that fails mid-statement
    (constraint violation on one row) must leave the target EXACTLY as
    it was — unlike the write-then-promote path there is no window where
    a reader can observe partial or missing rows."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
        jdbc_merge_upsert,
    )

    spark._jvm.java.lang.Class.forName(DRIVER)
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby_url)
    try:
        st = conn.createStatement()
        st.executeUpdate(
            "CREATE TABLE MERGE_G (k INT, payload VARCHAR(16) NOT NULL)"
        )
        st.executeUpdate("INSERT INTO MERGE_G VALUES (1, 'old-1'), (2, 'old-2')")
        st.close()
    finally:
        conn.close()

    # row (2, NULL) violates NOT NULL during UPDATE -> whole MERGE rolls back
    bad = spark.createDataFrame(
        [(2, None), (4, "new-4")], "k int, payload string"
    )
    with pytest.raises(Exception):
        jdbc_merge_upsert(
            bad, derby_url, "MERGE_G", keys=["k"],
            properties=PROPS, staging_column_types="k INT, payload VARCHAR(16)",
        )
    final = {
        tuple(r)
        for r in read_jdbc_table(spark, derby_url, "MERGE_G", properties=PROPS).collect()
    }
    assert final == {(1, "old-1"), (2, "old-2")}  # untouched


def test_jdbc_merge_rejects_duplicate_source_keys(spark, derby_url):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
        jdbc_merge_upsert,
    )

    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "k int, payload string"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        jdbc_merge_upsert(dup, derby_url, "MERGE_T", keys=["k"], properties=PROPS)


def test_jdbc_merge_connection_carries_properties(spark, derby_url):
    """Regression (round-6 ADVICE): the MERGE statement's connection
    must be opened with the same `properties` as the staging bulk write.
    Derby maps each user to its own default schema, so connecting the
    staging write as MUSER but the MERGE as the default APP user makes
    the unqualified staging/target names resolve to different schemas —
    exactly the authenticated-target failure mode. With properties
    forwarded, both statements run as MUSER and the merge lands."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
        jdbc_merge_upsert,
    )

    props = dict(PROPS)
    props.update({"user": "MUSER", "password": "anything"})
    # target under the MUSER schema, like a DBA-created authenticated DB
    spark._jvm.java.lang.Class.forName(DRIVER)
    jp = spark._jvm.java.util.Properties()
    jp.setProperty("user", "MUSER")
    jp.setProperty("password", "anything")
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby_url, jp)
    try:
        st = conn.createStatement()
        st.executeUpdate("CREATE TABLE MERGE_AUTH (k INT, payload VARCHAR(16))")
        st.executeUpdate("INSERT INTO MERGE_AUTH VALUES (1, 'old-1')")
        st.close()
    finally:
        conn.close()
    source = spark.createDataFrame(
        [(1, "new-1"), (2, "new-2")], "k int, payload string"
    )
    jdbc_merge_upsert(
        source, derby_url, "MERGE_AUTH", keys=["k"], properties=props,
        staging_column_types="k INT, payload VARCHAR(16)",
    )
    back = {
        tuple(r)
        for r in read_jdbc_table(
            spark, derby_url, "MERGE_AUTH", properties=props
        ).collect()
    }
    assert back == {(1, "new-1"), (2, "new-2")}


def test_upsert_statement_dialects():
    """Statement-text pin for the URL-selected upsert dialect: MySQL /
    MariaDB emit INSERT..SELECT..ON DUPLICATE KEY UPDATE (the
    reference's Aurora REPLACE-by-key semantics, load_job.py:74-90);
    everything else emits ANSI MERGE (Derby-live-tested above)."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
        upsert_statement_sql,
    )

    cols, keys = ["K", "A", "B"], ["K"]
    my = upsert_statement_sql(
        "jdbc:mysql://db:3306/ref", "T", "T_STAGE", cols, keys
    )
    assert my == (
        "INSERT INTO T (K, A, B) SELECT s.K, s.A, s.B FROM T_STAGE s "
        "ON DUPLICATE KEY UPDATE A = s.A, B = s.B"
    )
    # VALUES() is deprecated/removed in MySQL 8 — must not be emitted
    assert "VALUES(" not in my
    assert upsert_statement_sql(
        "jdbc:mariadb://db/ref", "T", "S", cols, keys
    ).startswith("INSERT INTO T")
    # key-only table: MySQL still requires an UPDATE clause -> no-op
    only = upsert_statement_sql("jdbc:mysql://db/ref", "T", "S", ["K"], ["K"])
    assert only.endswith("ON DUPLICATE KEY UPDATE K = K")
    ansi = upsert_statement_sql(
        "jdbc:derby:memory:x", "T", "T_STAGE", cols, keys
    )
    assert ansi == (
        "MERGE INTO T t USING T_STAGE s ON (t.K = s.K) "
        "WHEN MATCHED THEN UPDATE SET t.A = s.A, t.B = s.B "
        "WHEN NOT MATCHED THEN INSERT (K, A, B) VALUES (s.K, s.A, s.B)"
    )
    # key-only ANSI MERGE: no WHEN MATCHED clause at all
    assert "WHEN MATCHED" not in upsert_statement_sql(
        "jdbc:postgresql://db/x", "T", "S", ["K"], ["K"]
    )
