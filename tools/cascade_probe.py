"""64x composed-cascade scale probe (VERDICT r10 task 8): per-query 16x
sweeps exist for every stage operator, but cross-stage superlinears —
checkpoint pressure BETWEEN stages, survivor-frame reuse — are invisible
to per-query sweeps. This runs ``plans/curation_batch.curate_corpus``
end-to-end (the curation_cascade_census configuration: URL dedup →
exact dedup → ExactSubstr L=20 rewrite → quality filter → domain cap →
token budget) at 1x and 64x, timing EVERY stage via the ``on_stage``
hook (each checkpointed stage frame is forced as it is created, so wall
time attributes to the stage that did the work; materialization is
reused downstream).

Replication: 64 copies with shifted doc_ids AND a per-replica suffix
token appended to the text, so exact dedup does NOT collapse the
replicas and every stage carries the full 64x volume — the adversarial
direction (verbatim replication would be absorbed by exact_dedup two
stages in, flattering everything after). URLs regenerate from the
shifted ids (the contract query's _doc_urls_messy rule), so the URL
space scales with the corpus.

In-session 1x control arm first (CLAUDE.md: sweep numbers are only
comparable with a same-session control). Prints one JSON line; the row
lands in BASELINE.md. Run: python tools/cascade_probe.py [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans import (
    curation_batch as CB,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_cascade(docs) -> dict[str, float]:
    times: dict[str, float] = {}
    last = time.perf_counter()

    def on_stage(name: str, frame) -> None:
        nonlocal last
        force(frame)
        now = time.perf_counter()
        times[name] = round(now - last, 2)
        last = now

    cur, report = CB.curate_corpus(
        docs,
        url_col="url",
        exactsubstr_min_tokens=20,
        min_quality=0.5,
        n_per_domain=10,
        token_budget=15000,
        on_stage=on_stage,
    )
    t0 = time.perf_counter()
    force(report)
    times["census"] = round(time.perf_counter() - t0, 2)
    times["total"] = round(sum(times.values()), 2)
    return times


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark(app_name="cascade-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    n_docs = base.count()

    replicated = (
        spark.range(n)
        .crossJoin(base.drop("n_chars"))
        .select(
            (F.col("doc_id") + F.col("id") * 10_000_000).alias("doc_id"),
            # per-replica suffix: replicas stay DISTINCT, every stage
            # carries the full n-times volume
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" rep"),
                F.col("id").cast("string"),
            ).alias("text"),
            "lang",
            "source",
        )
        .repartition(32)
        .persist()
    )
    n_big = replicated.count()

    # untimed warmup cascade (JVM codegen, Python workers, shuffle
    # service) so the 1x control arm is not charged session startup
    run_cascade(entrymod._doc_urls_messy(base.drop("n_chars")))

    one = run_cascade(entrymod._doc_urls_messy(base.drop("n_chars")))
    big = run_cascade(entrymod._doc_urls_messy(replicated))
    stages = [k for k in big if k != "total"]
    out = {
        "factor": n,
        "docs_1x": n_docs,
        "docs_big": n_big,
        "stages": {
            k: {
                "t1": one.get(k),
                "tn": big[k],
                "ratio": (
                    round(big[k] / one[k], 1) if one.get(k) else None
                ),
            }
            for k in stages
        },
        "total_1x": one["total"],
        "total_big": big["total"],
        "total_ratio": round(big["total"] / one["total"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
