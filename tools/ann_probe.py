"""ANN scaling probe: what ivf_topk buys over brute-force cosine_topk
when the corpus outgrows the O(n_queries x n_corpus) cross join.

Setup (deterministic, generated into /tmp): a 200k-vector, 64-dim corpus
drawn from 64 gaussian cluster centers (center generated driver-side from
a fixed seed; per-dimension noise from xxhash64(id, dim) so the data is
identical regardless of partitioning), plus 1024 queries drawn from the
same centers with a disjoint id range. Clustered data is the realistic
embedding case AND the case IVF needs: on uniform random vectors no
coarse quantizer can work.

Because corpus cluster membership is id % n_clusters, the first NCELLS
corpus vectors by id cover every true center evenly (NCELLS/64 noisy
samples of each) — so ivf_topk's deterministic "first ncells by id"
centroid rule aligns with the true structure and the probe measures the
IVF mechanism, not centroid-training luck.

Measured (single warm run each; a throwaway action warms the JVM, and
the interesting quantity — the brute/IVF ratio — is intra-run):
  brute      cosine_topk: every query scored against every corpus vector
  blas       cosine_topk_vectorized: same exact result via one numpy
             matmul per Arrow batch + per-partition local top-k (the
             pair relation never exists as Spark rows)
  build      build_ivf_index at ncells=256 + persist corpus_cells to
             parquet — the one-time, corpus-only cost (N x ncells
             scorings). ncells (~sqrt(N), the production heuristic) is
             4x the true cluster count, so every cluster splits across
             ~4 cells and low nprobe genuinely misses sibling-cell
             neighbors — the recall/speed tradeoff IVF actually has.
  serve@p    ivf_topk against the persisted index, nprobe=p in
             {1, 4, 16}: each query scored only against cells holding
             ~p/256 of the corpus — the per-query-batch marginal cost.
  recall@10  |ivf top-10 ∩ brute top-10| / (n_queries * 10)

Prints one JSON line; numbers land in BASELINE.md's ANN-probe section.
Run: python tools/ann_probe.py
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    similarity as S,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

N_CORPUS = 200_000
N_QUERIES = 1024
DIM = 64
N_CLUSTERS = 64
NCELLS = 256  # ~sqrt(N): each true cluster splits over ~4 cells
K = 10
NOISE = 1.1  # clusters overlap a little; cell-splitting (ncells > true
# cluster count) is what makes the recall curve non-trivial
WORK = "/tmp/ann_probe"


def _vector_expr(centers_lit):
    """center[id % C][d] + noise(id, d), noise in [-NOISE, NOISE].

    xxhash64-derived noise is a pure function of (id, d): the dataset is
    bit-identical however Spark partitions the generating range.
    """
    cluster = F.pmod("id", F.lit(N_CLUSTERS)).cast("int")
    return F.array(
        *[
            F.element_at(centers_lit, cluster + 1)[d]
            + (
                (F.pmod(F.xxhash64("id", F.lit(d)), F.lit(2001)) - 1000)
                / 1000.0
            )
            * NOISE
            for d in range(DIM)
        ]
    ).alias("embedding")


def build_inputs(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    rnd = random.Random(7)
    centers = [
        [rnd.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(N_CLUSTERS)
    ]
    centers_lit = F.array(
        *[F.array(*[F.lit(x) for x in c]) for c in centers]
    )
    corpus = spark.range(N_CORPUS).select(
        F.col("id").alias("vec_id"), _vector_expr(centers_lit)
    )
    corpus.repartition(16).write.parquet(f"{WORK}/corpus")
    queries = spark.range(N_CORPUS, N_CORPUS + N_QUERIES).select(
        F.col("id").alias("vec_id"), _vector_expr(centers_lit)
    )
    queries.coalesce(1).write.parquet(f"{WORK}/queries")


def timed(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 2)


def main():
    spark = get_spark()
    build_inputs(spark)
    corpus = spark.read.parquet(f"{WORK}/corpus")
    queries = spark.read.parquet(f"{WORK}/queries")
    corpus.count(), queries.count()  # warm the scan path

    brute = S.cosine_topk(corpus, queries, k=K)
    brute_sec = timed(lambda: brute.write.mode("overwrite").format("noop").save())
    exact = brute.select("query_id", "neighbor_id").cache()
    n_exact = exact.count()  # materialize once for the recall joins

    blas = S.cosine_topk_vectorized(corpus, queries, k=K)
    blas_sec = timed(lambda: blas.write.mode("overwrite").format("noop").save())
    blas_match = blas.join(exact, ["query_id", "neighbor_id"], "left_semi").count()

    out = {
        "n_corpus": N_CORPUS,
        "dim": DIM,
        "n_queries": N_QUERIES,
        "k": K,
        "ncells": NCELLS,
        "brute_sec": brute_sec,
        "blas_sec": blas_sec,
        "blas_speedup": round(brute_sec / blas_sec, 1),
        "blas_exact_match": blas_match == n_exact,
    }

    def build():
        centroids, cells = S.build_ivf_index(corpus, ncells=NCELLS)
        cells.write.mode("overwrite").parquet(f"{WORK}/cells")
        return centroids

    t0 = time.monotonic()
    centroids = build()
    out["build_sec"] = round(time.monotonic() - t0, 2)
    index = (centroids, spark.read.parquet(f"{WORK}/cells"))

    for nprobe in (1, 4, 16):
        ivf = S.ivf_topk(
            corpus, queries, k=K, ncells=NCELLS, nprobe=nprobe, index=index
        )
        sec = timed(lambda: ivf.write.mode("overwrite").format("noop").save())
        hits = ivf.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
        out[f"serve_p{nprobe}_sec"] = sec
        out[f"serve_p{nprobe}_recall"] = round(hits / n_exact, 4)
        out[f"serve_p{nprobe}_speedup"] = round(brute_sec / sec, 1)

    # incremental maintenance: a 10k-vector delta arrives. extend =
    # assign ONLY the delta against the fixed centroids and append its
    # cells (the "index is a partitioned table maintained incrementally"
    # claim); rebuild = re-pay the full (N+delta) x ncells build. The
    # cells are identical either way (test-pinned); the probe measures
    # what the incremental path saves.
    n_delta = 10_000
    rnd2 = random.Random(7)
    centers = [
        [rnd2.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(N_CLUSTERS)
    ]
    centers_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centers])
    delta = spark.range(
        N_CORPUS + N_QUERIES, N_CORPUS + N_QUERIES + n_delta
    ).select(F.col("id").alias("vec_id"), _vector_expr(centers_lit))
    delta.repartition(4).write.parquet(f"{WORK}/delta")
    delta = spark.read.parquet(f"{WORK}/delta")

    idx_on_disk = (centroids, spark.read.parquet(f"{WORK}/cells"))
    ext_cells = S.extend_ivf_index(idx_on_disk, delta)[1]
    out["extend_delta_rows"] = n_delta
    # extend = read the existing cells table + assign ONLY the delta
    # (O(delta x ncells)); rebuild re-pays the full (N+delta) x ncells
    # scoring pass. The cells are identical either way because
    # build_ivf_index's centroids are the first NCELLS vectors by id and
    # the delta's ids are all larger — the union picks the same
    # centroids, and assignment is a pure function of (vector,
    # centroids). Checked below as an exact (vec_id, cell) set match,
    # not a row count (counts are equal by construction at nprobe=1).
    out["extend_sec"] = timed(
        lambda: ext_cells.write.mode("overwrite").format("noop").save()
    )
    reb_cells = S.build_ivf_index(corpus.unionByName(delta), ncells=NCELLS)[1]
    out["rebuild_sec"] = timed(
        lambda: reb_cells.write.mode("overwrite").format("noop").save()
    )
    out["extend_speedup_vs_rebuild"] = round(
        out["rebuild_sec"] / out["extend_sec"], 1
    )
    n_agree = (
        ext_cells.select("vec_id", "cell")
        .join(reb_cells.select("vec_id", "cell"), ["vec_id", "cell"])
        .count()
    )
    out["extend_matches_rebuild_assignments"] = (
        n_agree == ext_cells.count() == reb_cells.count()
    )
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
