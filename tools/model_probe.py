"""Scale probe for the model-based curation operators (DSIR selection,
logistic-regression classifier, CCNet bucketing, power-iteration PCA,
vectorized SemDeDup): replicate the sf0.1 documents/embeddings tables Nx
with shifted ids (shapes preserved, cardinality scaled) and compare
wall-clock vs 1x.

Run: python tools/model_probe.py [replication_factor]
Prints a markdown row set for BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    classifier as CL,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    similarity as SM,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import text as T
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_ops(docs, emb):
    is_en = F.coalesce(F.col("lang"), F.lit("")) == "en"

    def _logreg():
        labeled = docs.withColumn("__y", is_en.cast("double"))
        w = CL.logreg_fit(labeled, "__y", dim=64, n_iter=2)
        return CL.logreg_predict(docs, w, dim=64)

    def _pca():
        comp = SM.pca_power_iteration(emb, n_iter=2)
        return SM.pca_project(emb, comp)

    out = {}
    for name, fn in [
        ("dsir_select", lambda: T.dsir_select(
            docs.filter(~is_en), docs.filter(is_en), k=100, dim=1024)),
        ("logreg_fit+predict", _logreg),
        ("ccnet_buckets", lambda: T.perplexity_buckets(docs)),
        ("pca_fit+project", _pca),
        ("semantic_dedup_vec", lambda: SM.semantic_dedup(
            emb, threshold=0.35, k=4, n_iter=2)),
    ]:
        t0 = time.perf_counter()
        force(fn())
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="model-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    docs.count(), emb.count()
    # warm the Python workers so the Arrow paths aren't charged startup
    force(spark.range(1000).repartition(32).mapInPandas(lambda it: it, "id long"))
    base = run_ops(docs, emb)

    reps = spark.range(n).select(F.col("id").alias("rep"))
    big_docs = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
        .drop("rep")
        .repartition(32)
        .persist()
    )
    big_emb = (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
        .drop("rep")
        .repartition(32)
        .persist()
    )
    big_docs.count(), big_emb.count()
    big = run_ops(big_docs, big_emb)

    print(f"\n| operator | 1x | {n}x | ratio |")
    print("|---|---|---|---|")
    for k in base:
        r = round(big[k] / base[k], 1) if base[k] else float("nan")
        print(f"| {k} | {base[k]} s | {big[k]} s | {r}x |")


if __name__ == "__main__":
    main()
