"""Quantify the residual-encoding recall claim: recall@10 vs the exact
cosine top-10 for flat IVF-PQ and residual IVF-PQ at the SAME budget
(ncells, nprobe, m_sub, k_codes), over the sf0.1 embeddings (2000 x 64)
with 20 query vectors.

The literature claim (Jégou et al., TPAMI 2011 §III): codebooks fit on
per-cell residuals spend their capacity on within-cell variation instead
of re-describing the coarse structure IVF already captured, so ADC
ranking inside a cell is finer. This probe MEASURES it on our synthetic
embeddings rather than asserting it.

Reference metric: the exact L2 top-10 restricted to the SAME probed
candidate set — ADC approximates L2 distances over the cells IVF chose,
so scoring it against an unrestricted cosine oracle would conflate
three unrelated losses (metric mismatch, cell-probe misses, codebook
error); this probe isolates the CODEBOOK question, which is the one
residual encoding answers.

SOLO run. Usage: python tools/residual_recall_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    similarity as S,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 20
PARAMS = dict(ncells=16, nprobe=4, m_sub=8, k_codes=16)


def recall(top, exact_top) -> dict[str, float]:
    hits = (
        exact_top.join(top, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    per_q = {
        r["query_id"]: r["h"] / K for r in hits.collect()
    }
    qids = [r["query_id"] for r in exact_top.select("query_id").distinct().collect()]
    vals = [per_q.get(q, 0.0) for q in qids]
    return {"mean_recall": round(sum(vals) / len(vals), 4), "n_queries": len(vals)}


def _clustered(spark, n: int = 2000, d: int = 64, n_clusters: int = 4):
    """Deterministic strongly-clustered vectors: md5-derived cluster
    centers (scale 1) + md5-derived within-cluster noise (scale 0.05) —
    the regime residual encoding is FOR. First n_clusters ids sit ON
    their cluster center so the first-k IVF centroids are the true
    centers."""
    import hashlib
    import struct

    def h01(*parts) -> float:  # deterministic uniform in [-1, 1)
        b = hashlib.md5("|".join(map(str, parts)).encode()).digest()
        return (struct.unpack(">Q", b[:8])[0] / 2**63) - 1.0

    centers = [
        [h01("c", c, j) for j in range(d)] for c in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        c = i % n_clusters
        if i < n_clusters:
            vec = list(centers[i])
        else:
            vec = [
                centers[c][j] + 0.05 * h01("n", i, j) for j in range(d)
            ]
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def _exact_l2_topk_on_candidates(emb, qs, cents, k: int, nprobe: int):
    """Exact L2 top-k over the SAME nprobe candidate set IVF-PQ scores
    — the reference that isolates codebook quality."""
    query_cells = S.assign_cells(qs, cents, nprobe=nprobe).select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    corpus_cells = S.assign_cells(emb, cents, nprobe=1).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    cand = (
        query_cells.join(corpus_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    q = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    from pyspark.sql import Window

    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "d2",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "qv", "cv", lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )


def _arm(emb, qs, params) -> dict:
    cents, _ = S.build_ivf_index(emb, ncells=params["ncells"])
    exact = _exact_l2_topk_on_candidates(
        emb, qs, cents, K, params["nprobe"]
    ).localCheckpoint()
    flat = S.ivf_pq_topk(emb, qs, k=K, **params).select(
        "query_id", "neighbor_id"
    )
    res = S.ivf_pq_residual_topk(emb, qs, k=K, **params).select(
        "query_id", "neighbor_id"
    )
    return {
        "params": params,
        "flat_ivfpq": recall(flat, exact),
        "residual_ivfpq": recall(res, exact),
    }


def main() -> None:
    spark = get_spark(app_name="residual-recall-probe")
    out = {}
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    out["sf_embeddings"] = {"sf_dir": SF_DIR, **_arm(emb, qs, PARAMS)}
    # clustered arm: 4 true clusters, ncells=4 (first-4 ids sit ON the
    # centers), k_codes=16 so the shared first-16 PQ seeds include 12
    # nonzero-residual members — the non-degenerate regime
    cemb = _clustered(spark).localCheckpoint()
    cqs = cemb.filter(F.col("vec_id") < N_QUERIES)
    cparams = dict(ncells=4, nprobe=1, m_sub=8, k_codes=16)
    out["clustered_synthetic"] = _arm(cemb, cqs, cparams)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
