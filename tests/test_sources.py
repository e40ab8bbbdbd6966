"""Source/sink tests (SURVEY.md §2.1): staged CSV reads, partitioned
writes, archive-with-verification, run utilities."""

import glob
import gzip
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark import schemas as S
from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans.runs import (
    bytes_to_gb,
    new_run_id,
    plan_run_sizing,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources import (
    read_csv_staged,
    read_pipe_csv,
    write_partitioned,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.archive import (
    archive_and_cleanup,
    list_files,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
    append_run_metrics,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sources-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


CSV_BODY = "co_nbr,supc,prc_zone,cust_nbr,eff_from_dttm\n019,104612,5,1234567,2020-08-06 00:00:00\n020,104613,4,1234568,2020-08-07 00:00:00\n"


def test_read_csv_staged_all_strings(spark, tmpdir):
    path = f"{tmpdir}/in.csv"
    with open(path, "w") as f:
        f.write(CSV_BODY)
    df = read_csv_staged(spark, path, S.PRICE_ZONE_STAGING_SCHEMA)
    assert [f.dataType.typeName() for f in df.schema.fields] == ["string"] * 5
    rows = df.orderBy("co_nbr").collect()
    assert rows[0]["co_nbr"] == "019" and rows[0]["prc_zone"] == "5"


def test_read_csv_gz_native(spark, tmpdir):
    """S2: the reference's decompress Glue job is eliminated — Spark reads
    .csv.gz directly; we repartition after (gz is unsplittable)."""
    path = f"{tmpdir}/in.csv.gz"
    with gzip.open(path, "wt") as f:
        f.write(CSV_BODY)
    df = read_csv_staged(spark, path, S.PRICE_ZONE_STAGING_SCHEMA, repartition_gz=4)
    assert df.count() == 2
    assert df.rdd.getNumPartitions() == 4


def test_read_pipe_csv(spark, tmpdir):
    path = f"{tmpdir}/pa.csv"
    with open(path, "w") as f:
        f.write("ITEM_ID|CURRENT_PRICE|REASON|NEW_PRICE|LOCAL_REFERENCE_PRICE|EFFECTIVE_DATE|EXPORT_DATE|ITEM_ATTR_5_NM|PRICE_ZONE_ID\n")
        f.write("104612|1|r|2|13.44|2020-08-06 10:11:12|2020-08-07 00:00:00|Y|019-5\n")
    df = read_pipe_csv(spark, path, S.PA_STAGING_SCHEMA)
    assert df.first()["PRICE_ZONE_ID"] == "019-5"


def test_write_partitioned_parquet_roundtrip_and_pruning(spark, tmpdir):
    df = spark.createDataFrame(
        [("019", i, float(i)) for i in range(10)]
        + [("020", i, float(i)) for i in range(10)],
        ["opco_id", "k", "v"],
    )
    out = f"{tmpdir}/out"
    write_partitioned(df, out, partition_by="opco_id")
    assert os.path.isdir(f"{out}/opco_id=019")
    back = spark.read.parquet(out)
    assert back.count() == 20
    # partition pruning: the filter must land in the scan's PartitionFilters
    pruned = back.filter(F.col("opco_id") == "019")
    import re

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*opco_id#\d+ = 019\)", plan), plan
    assert pruned.count() == 10


def test_write_partitioned_csv_quote_disabled(spark, tmpdir):
    """S5 fidelity: the reference writes CSV with quoting disabled
    (quoteChar: -1, transform_spark_job.py:110)."""
    df = spark.createDataFrame([("019", 'va"lue')], ["opco_id", "v"])
    out = f"{tmpdir}/csv"
    write_partitioned(df, out, partition_by="opco_id", fmt="csv")
    body = open(glob.glob(f"{out}/opco_id=019/*.csv")[0]).read()
    assert 'va"lue' in body  # no quote escaping applied


def test_append_run_metrics(spark, tmpdir):
    path = f"{tmpdir}/metrics"
    m1 = spark.createDataFrame([("run1", 100, 90)], ["run_id", "total", "valid"])
    m2 = spark.createDataFrame([("run2", 50, 50)], ["run_id", "total", "valid"])
    append_run_metrics(m1, path)
    append_run_metrics(m2, path)
    assert spark.read.parquet(path).count() == 2


def test_archive_and_cleanup(spark, tmpdir):
    src = f"{tmpdir}/src"
    os.makedirs(f"{src}/opco_id=019", exist_ok=True)
    for i in range(3):
        with open(f"{src}/opco_id=019/f{i}.csv", "w") as f:
            f.write(f"data{i}\n")
    res = archive_and_cleanup(spark, src, f"{tmpdir}/archive")
    assert res.copied == 3 and res.deleted == 3
    assert len(list_files(spark, f"{tmpdir}/archive")) == 3
    assert len(list_files(spark, src)) == 0  # sources removed


def test_archive_keep_source(spark, tmpdir):
    src = f"{tmpdir}/src2"
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/a.txt", "w") as f:
        f.write("x")
    res = archive_and_cleanup(spark, src, f"{tmpdir}/arch2", delete_source=False)
    assert res.copied == 1 and res.deleted == 0
    assert len(list_files(spark, src)) == 1


def test_run_sizing_decision():
    # reference truth: <= bound → partial/MIN; above → full/MAX
    assert bytes_to_gb(10**10) == 9.31
    r = plan_run_sizing(10**9, partial_upper_bound_gb=5.0)
    assert (r.mode, r.worker_count) == ("partial", 2)
    r = plan_run_sizing(10**11, partial_upper_bound_gb=5.0)
    assert (r.mode, r.worker_count) == ("full", 10)
    assert r.shuffle_partitions == 80


def test_new_run_id_unique():
    a, b = new_run_id(ts=1700000000), new_run_id(ts=1700000000)
    assert a != b and a.startswith("etl_output_1700000000_")


# --- JSONL corpus source/sink ------------------------------------------------


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmpdir):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.readers import (
        read_jsonl,
        split_corrupt,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.writers import (
        write_jsonl,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("source", StringType()),
        ]
    )
    raw = f"{tmpdir}/raw.jsonl"
    with open(raw, "w") as f:
        f.write('{"doc_id": 1, "text": "hello world", "source": "a"}\n')
        f.write('{"doc_id": 2, "text": "second doc", "source": "b"}\n')
        f.write('{"doc_id": 3, "text": "broken\n')  # malformed line
        f.write('not json at all\n')
    df = read_jsonl(spark, raw, schema)
    good, bad = split_corrupt(df)
    assert good.count() == 2
    assert bad.count() == 2
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    # quarantine preserves the raw line for replay/debugging
    assert any("not json" in r["_corrupt_record"] for r in bad.collect())

    out = f"{tmpdir}/out"
    write_jsonl(good, out, partition_by="source")
    back = read_jsonl(spark, out, schema)
    g2, b2 = split_corrupt(back)
    assert b2.count() == 0
    assert {r["doc_id"] for r in g2.collect()} == {1, 2}
    # hive partitioning: source dirs exist, column not duplicated in files
    import os

    assert sorted(
        d for d in os.listdir(out) if d.startswith("source=")
    ) == ["source=a", "source=b"]


def test_jsonl_gz_repartition(spark, tmpdir):
    import gzip as _gz

    from pyspark.sql.types import LongType, StructField, StructType

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.readers import (
        read_jsonl,
    )

    schema = StructType([StructField("doc_id", LongType())])
    path = f"{tmpdir}/in.jsonl.gz"
    with _gz.open(path, "wt") as f:
        for i in range(10):
            f.write(f'{{"doc_id": {i}}}\n')
    df = read_jsonl(spark, path, schema, repartition_gz=4)
    assert df.count() == 10
    assert df.rdd.getNumPartitions() == 4


def test_orc_partitioned_roundtrip_and_pushdown(spark, tmpdir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.readers import (
        read_orc,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        ["id", "opco_id", "price"],
    )
    out = f"{tmpdir}/orc_out"
    write_partitioned(df, out, partition_by="opco_id", fmt="orc")
    back = read_orc(spark, out)
    assert back.count() == 3
    assert {r["opco_id"] for r in back.select("opco_id").distinct().collect()} == {"a", "b"}
    # partition pruning: filtering the partition column reads one dir
    pruned = back.filter(F.col("opco_id") == "a")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "opco_id=b" not in plan
    # predicate pushdown reaches the ORC scan
    pushed = back.filter(F.col("price") > 15.0)
    pplan = pushed._jdf.queryExecution().toString()
    assert "PushedFilters: [" in pplan and "price" in pplan.split("PushedFilters")[1][:120]


def test_read_media_files_binaryfile_roundtrip(spark, tmp_path):
    """binaryFile ingest → decode_media(real) closes the multimodal
    loop: files on disk in, parsed header metadata out."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.multimodal import (
        decode_media,
        synthetic_real_media,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.readers import (
        read_media_files,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 1, 2, 3)], ["doc_id"])
    ext_for = {"image/png": "png", "image/gif": "gif",
               "audio/wav": "wav", "video/mp4": "mp4"}
    by_name = {}
    for r in synthetic_real_media(ids).collect():
        name = f"m{r['media_id']}.{ext_for[r['mime']]}"
        (tmp_path / name).write_bytes(bytes(r["payload"]))
        by_name[name] = r
    (tmp_path / "notes.txt").write_bytes(b"not media")

    raw = read_media_files(spark, str(tmp_path), pattern="*.{png,gif,wav,mp4}")
    rows = {r["media_path"].rsplit("/", 1)[-1]: r for r in raw.collect()}
    assert set(rows) == set(by_name)  # glob filtered the txt out
    for name, r in rows.items():
        assert r["kind"] == by_name[name]["kind"]
        assert bytes(r["payload"]) == bytes(by_name[name]["payload"])
        assert r["n_bytes"] == len(bytes(r["payload"]))

    decoded = {
        r["kind"]: r for r in decode_media(raw, fake=False).collect()
    }
    assert decoded["image"]["width"] is not None
    assert decoded["audio"]["duration_ms"] is not None
    assert decoded["video"]["duration_ms"] is not None

    # media_id is path-stable: re-reading yields identical ids
    again = {r["media_path"]: r["media_id"] for r in
             read_media_files(spark, str(tmp_path), "*.{png,gif,wav,mp4}").collect()}
    first = {r["media_path"]: r["media_id"] for r in raw.collect()}
    assert again == first
