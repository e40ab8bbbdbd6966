"""Full-tier scale sweep: re-time the most expensive bench queries on a
16x-replicated dataset and report per-query scale ratios (numbers in
BASELINE.md).

Why: the per-round bench at sf0.1 cannot catch superlinear plans — a
query that is quadratic in a fact table looks fine at 5k docs and melts
at 80k. The per-operator probes catch this, but only where the builder
thought to look; this tool sweeps the top of the bench tier uniformly.

Mechanics: fact tables (orders, lineitem, events, documents,
embeddings) are replicated 16x with shifted primary ids (orderkey shift
shared by orders+lineitem so joins stay consistent); dimension tables
(region, nation, customer, supplier, part) stay 1x — the "facts grow,
dims broadcast" scaling posture, which also means per-entity group
sizes grow 16x (the adversarial direction for groupBy-heavy plans).
Each query then runs via its ordinary (spark, sf_dir) contract entry at
both the 1x and 16x directory, best-of-N, forced with noop writes.

Reading the ratios on a fixed 32-core host: ideal linear scaling shows
ratio <= ~16 (less when the 1x run is overhead-dominated, which most
sub-second queries are). ratio > 16 means superlinear work or a
capacity cliff (spill, single-task stage) — those queries get a named
lever or a fix in BASELINE.md.

The four guarded quadratic oracle baselines (dedup_jaccard,
embedding_near_dup, ann_cosine_topk, corpus_admitted) are excluded by
design: they are documented O(n^2) mirrors with green scale siblings,
and util.guard_quadratic already refuses them at corpus scale.

SOLO run required (a concurrent JVM inflates timings 1.3-3x).
Run: python tools/scale_sweep.py [query ...]   # default: top-10 of r5
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.readers import (
    TESTDATA_TABLES,
)

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SCALE_SWEEP_DIR", "/tmp/scale_sweep_16x")
REPLICAS = int(os.environ.get("SCALE_SWEEP_REPLICAS", "16"))
BEST_OF = max(1, int(os.environ.get("BENCH_BEST_OF", "2")))

# top-10 most expensive r5 bench queries, guarded quadratic baselines
# excluded (their scale siblings dedup_minhash_lsh / embedding_near_dup_lsh
# / ann_ivf_topk / corpus_admitted_indexed are contract-green and three of
# them probe-verified in BASELINE.md already)
DEFAULT_QUERIES = [
    "pca_top2_projections",
    "dedup_clusters_star",
    "approx_aggregates",
    "price_quantiles",
    "pca_component",
    "corpus_curation",
    "kmeans_clusters",
    "language_id",
    "multi_distinct",
    "bigram_logprob",
]

# (id column to shift, shift stride) per fact table; dims are copied 1x.
# orders and lineitem share the orderkey stride so the join keys stay
# consistent across replicas.
FACT_SHIFTS = {
    "orders": [("o_orderkey", 1_000_000_000)],
    "lineitem": [("l_orderkey", 1_000_000_000)],
    "events": [("event_id", 1_000_000_000)],
    "documents": [("doc_id", 10_000_000)],
    "embeddings": [("vec_id", 10_000_000)],
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_16x(spark) -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    for t in TESTDATA_TABLES:
        src = f"{BASE_SF}/{t}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if t in FACT_SHIFTS:
            parts = []
            for i in range(REPLICAS):
                p = df
                for col, stride in FACT_SHIFTS[t]:
                    p = p.withColumn(col, F.col(col) + F.lit(i * stride))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(32).write.parquet(f"{WORK}/{t}.parquet")
        else:
            df.write.parquet(f"{WORK}/{t}.parquet")


def timed(fn) -> float:
    best = None
    for _ in range(BEST_OF):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return round(best, 2)


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="scale-sweep-16x")
    qs = entrymod.queries()
    build_16x(spark)
    # warm both directories + the Python worker pool (bench.py doctrine)
    for d in (BASE_SF, WORK):
        for t in TESTDATA_TABLES:
            p = f"{d}/{t}.parquet"
            if os.path.exists(p):
                force(spark.read.parquet(p))
    force(
        spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long")
    )

    out: dict = {"replicas": REPLICAS, "queries": {}}
    for name in names:
        if name not in qs:
            out["queries"][name] = {"error": "unknown query"}
            continue
        row: dict = {}
        try:
            row["t1"] = timed(lambda: force(qs[name](spark, BASE_SF)))
            row["t16"] = timed(lambda: force(qs[name](spark, WORK)))
            row["ratio"] = round(row["t16"] / max(row["t1"], 1e-9), 1)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            row["error"] = f"{type(exc).__name__}: {exc}"[:300]
        out["queries"][name] = row
        print(f"SWEEP {name}: {row}", file=sys.stderr)
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
