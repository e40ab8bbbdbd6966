"""Scale probe for the curation operators (decontaminate,
repetition_stats, unigram_logprob): replicate the sf0.1 documents table
Nx with shifted ids (vocabulary and doc shapes preserved, corpus
cardinality scaled) and compare wall-clock vs 1x.

Run: python tools/curation_probe.py [replication_factor]
Appends nothing — prints a markdown row set for BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import dedup as D
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import text as T
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_ops(docs, bench):
    out = {}
    for name, fn in [
        ("decontaminate", lambda: D.decontaminate(docs, bench, shingle_n=3)),
        ("repetition_stats", lambda: T.repetition_stats(docs)),
        ("unigram_logprob", lambda: T.unigram_logprob(docs)),
        ("span_dedup", lambda: D.span_dedup(docs, span_words=3)),
        ("gopher_rules", lambda: T.gopher_rules(docs)),
        # round-4 dedup additions: both ride the capped-LSH candidate
        # machinery, so the interesting question is whether the verify /
        # signature-compare stage stays near-linear as the corpus grows
        ("containment_pairs", lambda: D.containment_pairs(
            docs, threshold=0.35, max_bucket_size=64)),
        ("minhash_estimate", lambda: D.minhash_estimate_pairs(
            docs, max_bucket_size=64)),
    ]:
        t0 = time.perf_counter()
        force(fn())
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="curation-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # BOTH inputs persist in memory so the comparison isolates operator
    # cost from parquet scan/decode — persisting only the big side would
    # flatter the Nx ratios
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    n_docs = base.count()
    bench = base.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")

    replicated = (
        spark.range(n)
        .crossJoin(base)
        .select(
            (F.col("doc_id") + F.col("id") * 10_000_000).alias("doc_id"),
            "text",
            "source",
        )
        .repartition(32)
        .persist()
    )
    replicated.count()

    one = run_ops(base, bench)
    big = run_ops(replicated, bench)
    print(f"| op | 1x ({n_docs} docs) | {n}x ({n_docs*n} docs) | ratio |")
    print("|---|---|---|---|")
    for k in one:
        ratio = big[k] / one[k] if one[k] else float("nan")
        print(f"| {k} | {one[k]} s | {big[k]} s | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
