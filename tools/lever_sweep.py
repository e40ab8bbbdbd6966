"""64x lever sweep: prove the documented 100 TB levers RESTORE
linearity on the three worst 16x-sweep queries, not just name it.

Round-6 findings (BASELINE.md): at 16x replicated facts the worst
scale ratios were dedup_clusters_star (5.4x — replicated identical
docs densify near-dup components), bigram_logprob (6.5x — the
long-tail |bigram-vocab| table), and price_quantiles (2.8x — exact
ordered-set percentiles). Each has a named lever:

- dedup_clusters_star  → EXACT DEDUP UPSTREAM (operators.dedup.
  exact_dedup): verbatim replicas collapse before the MinHash graph is
  built, so the near-dup component structure returns to corpus shape.
- bigram_logprob       → MIN-COUNT VOCAB PRUNING (min_count=2,
  round 7): hapax bigram types leave the model table before the probe
  join.
- price_quantiles      → APPROX PERCENTILE (the contract-pinned
  price_quantiles_approx sibling): bounded sketch state instead of
  per-group sorted buffers.

This tool replicates the sf0.1 facts 64x (shifted ids, dims 1x — the
scale_sweep posture, two tiers past the bench) and times each query
lever-OFF vs lever-ON, plus the 1x control in the same session (16x
probes are NOT comparable across testdata regenerations — CLAUDE.md).
A lever "restores linearity" when t64_on / t1 stays at or under the
replica factor while t64_off exceeds it.

SOLO run required. Run: python tools/lever_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
import tools.scale_sweep as ss
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    clustering,
    dedup as DD,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    text as TX,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark
from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.readers import (
    TESTDATA_TABLES,
)

REPLICAS = int(os.environ.get("LEVER_SWEEP_REPLICAS", "64"))
WORK = os.environ.get("LEVER_SWEEP_DIR", f"/tmp/scale_sweep_{REPLICAS}x")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def clusters_star_off(spark, sf_dir):
    return entrymod.queries()["dedup_clusters_star"](spark, sf_dir)


def clusters_star_on(spark, sf_dir):
    """Lever: exact dedup upstream — identical replicas collapse to
    their keeper BEFORE fingerprint/banding, so the near-dup graph is
    corpus-shaped; replica members then inherit their keeper's cluster
    through the exact-group table (one broadcast-out join, no extra
    graph rounds)."""
    docs = _docs(spark, sf_dir)
    groups = DD.exact_dedup_groups(docs)  # fp -> keep_id, n_docs
    keepers = (
        docs.select("doc_id", "text", DD.fingerprint("text").alias("fp"))
        .join(groups.select("fp", "keep_id"), "fp")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text")
    )
    pairs = DD.minhash_dedup_pairs(keepers, threshold=0.2).select("a", "b")
    comp = clustering.connected_components_star(pairs)
    keeper_cluster = (
        keepers.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            F.col("doc_id").alias("keep_id"),
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
        )
    )
    return (
        docs.select("doc_id", DD.fingerprint("text").alias("fp"))
        .join(groups.select("fp", "keep_id"), "fp")
        .join(keeper_cluster, "keep_id")
        .select("doc_id", "cluster_id")
    )


def bigram_off(spark, sf_dir):
    return TX.bigram_logprob(_docs(spark, sf_dir))


def bigram_on(spark, sf_dir):
    return TX.bigram_logprob(_docs(spark, sf_dir), min_count=2)


def quantiles_off(spark, sf_dir):
    return entrymod.queries()["price_quantiles"](spark, sf_dir)


def quantiles_on(spark, sf_dir):
    """Lever: the sketch ALONE — bounded state per group. (The
    contract query price_quantiles_approx is the CALIBRATION form: it
    computes exact AND approx side by side so the oracle can band the
    sketch error; carrying the exact buffers at the 64x tier is what
    OOMed the first run of this sweep — at scale only the sketch
    runs.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99),"
            " 10000)"
        ).alias("q")
    )


def prefix_jaccard_off(spark, sf_dir):
    return entrymod.queries()["prefix_jaccard_pairs"](spark, sf_dir)


def prefix_jaccard_on(spark, sf_dir):
    """Lever: exact dedup upstream — the replicated stress layout makes
    every doc's 16/64 verbatim copies mutual J=1 pairs, so the EXACT
    join's own output (and its prefix buckets) grow quadratically in
    the replica factor. Collapsing verbatim copies first (the standard
    intake order: exact dedup → near-dup join) returns both the
    candidate buckets and the output to corpus shape."""
    docs = _docs(spark, sf_dir)
    groups = DD.exact_dedup_groups(docs)
    keepers = (
        docs.select("doc_id", "text", DD.fingerprint("text").alias("fp"))
        .join(groups.select("fp", "keep_id"), "fp")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text")
    )
    return DD.prefix_filter_pairs(
        keepers, threshold_num=1, threshold_den=2, shingle_n=3
    )


def prefix_intake_off(spark, sf_dir):
    return entrymod.queries()["prefix_intake_admitted"](spark, sf_dir)


def prefix_intake_on(spark, sf_dir):
    """Lever: exact dedup upstream of BOTH intake sides. On the
    replicated stress layout every batch doc has 64 verbatim copies and
    so does every corpus doc, so the batch×corpus candidate buckets
    (and any true match's verify fan-out) grow as replicas² by
    construction. Collapsing verbatim copies first (standard intake
    order) probes the index with corpus-shaped sides; admission then
    EXPANDS back through the exact groups — J(copy, x) = J(keeper, x),
    so a copy is admitted iff its keeper is (exactness-preserving,
    pinned at 1x)."""
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.substring("source", 4, 10).cast("int") < 10)
    new = docs.filter(F.substring("source", 4, 10).cast("int") >= 10)

    def _keepers(side, groups):
        return (
            side.select("doc_id", "text", DD.fingerprint("text").alias("fp"))
            .join(groups.select("fp", "keep_id"), "fp")
            .filter(F.col("doc_id") == F.col("keep_id"))
            .select("doc_id", "text")
        )

    cg = DD.exact_dedup_groups(corpus)
    ng = DD.exact_dedup_groups(new)
    index = DD.build_prefix_index(
        _keepers(corpus, cg), threshold_num=1, threshold_den=2, shingle_n=3
    )
    adm_keepers = DD.prefix_dedup_against_corpus(
        _keepers(new, ng), index, threshold_num=1, threshold_den=2,
        shingle_n=3,
    ).select(F.col("doc_id").alias("keep_id"))
    return (
        new.select("doc_id", "source", DD.fingerprint("text").alias("fp"))
        .join(ng.select("fp", "keep_id"), "fp")
        .join(adm_keepers, "keep_id", "left_semi")
        .select("doc_id", "source")
    )


def banding_report_off(spark, sf_dir):
    return entrymod.queries()["lsh_banding_report"](spark, sf_dir)


def banding_report_on(spark, sf_dir):
    """Lever: exact dedup upstream + WEIGHTED advisor (r12). The
    advisor's input under verbatim replication is output-quadratic
    (every copy pair is J=1), but each replicated pair's collision
    probability is a function of its KEEPER pair's jaccard alone — so
    run the exact join on keepers only, weight each keeper pair by
    n_docs(a)·n_docs(b), add one j=1 row of weight C(n,2) per exact
    group, and lsh_banding_plan(weight_col=) reproduces the raw-pair
    advisor exactly (pinned equal_at_1x) at keeper-pair cost."""
    docs = _docs(spark, sf_dir)
    groups = DD.exact_dedup_groups(docs)  # fp -> keep_id, n_docs
    keepers = (
        docs.select("doc_id", "text", DD.fingerprint("text").alias("fp"))
        .join(groups.select("fp", "keep_id"), "fp")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text")
    )
    kp = DD.prefix_filter_pairs(
        keepers, threshold_num=1, threshold_den=2, shingle_n=3
    )
    sizes = groups.select(F.col("keep_id"), F.col("n_docs"))
    weighted = (
        kp.join(sizes.select(F.col("keep_id").alias("a"),
                             F.col("n_docs").alias("na")), "a")
        .join(sizes.select(F.col("keep_id").alias("b"),
                           F.col("n_docs").alias("nb")), "b")
        .select("jaccard", (F.col("na") * F.col("nb")).alias("w"))
    )
    intra = (
        groups.filter(F.col("n_docs") >= 2)
        .select(
            F.lit(1.0).alias("jaccard"),
            (F.col("n_docs") * (F.col("n_docs") - 1) / F.lit(2))
            .cast("bigint")
            .alias("w"),
        )
    )
    return DD.lsh_banding_plan(
        weighted.unionByName(intra), num_hashes=16, weight_col="w"
    )


PAIRS = {
    "dedup_clusters_star": (clusters_star_off, clusters_star_on),
    "lsh_banding_report": (banding_report_off, banding_report_on),
    "bigram_logprob": (bigram_off, bigram_on),
    "price_quantiles": (quantiles_off, quantiles_on),
    "prefix_jaccard_pairs": (prefix_jaccard_off, prefix_jaccard_on),
    "prefix_intake_admitted": (prefix_intake_off, prefix_intake_on),
}


def main() -> None:
    names = sys.argv[1:] or list(PAIRS)
    spark = get_spark(app_name=f"lever-sweep-{REPLICAS}x")
    ss.REPLICAS = REPLICAS
    ss.WORK = WORK
    ss.build_16x(spark)
    for d in (ss.BASE_SF, WORK):
        for t in TESTDATA_TABLES:
            p = f"{d}/{t}.parquet"
            if os.path.exists(p):
                ss.force(spark.read.parquet(p))
    ss.force(
        spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long")
    )

    out: dict = {"replicas": REPLICAS, "queries": {}}
    for name in names:
        off, on = PAIRS[name]
        row: dict = {}
        try:
            if name in (
                "dedup_clusters_star",
                "prefix_intake_admitted",
                "lsh_banding_report",
            ):
                # these levers are exactness-preserving (keeper = group
                # min id; J(copy, x) = J(keeper, x)): pin it
                a = {tuple(r) for r in off(spark, ss.BASE_SF).collect()}
                b = {tuple(r) for r in on(spark, ss.BASE_SF).collect()}
                row["equal_at_1x"] = a == b
            on_only = bool(os.environ.get("LEVER_SWEEP_ON_ONLY"))
            if not on_only:
                row["t1_off"] = ss.timed(
                    lambda: ss.force(off(spark, ss.BASE_SF))
                )
            row["t1_on"] = ss.timed(lambda: ss.force(on(spark, ss.BASE_SF)))
            if not on_only:
                # the off arm of an output-quadratic query can exceed
                # local shuffle disk at 64x (lsh_banding_report's raw
                # pair input spilled past the container disk) — set
                # LEVER_SWEEP_ON_ONLY=1 to record the lever arm alone
                row["t64_off"] = ss.timed(lambda: ss.force(off(spark, WORK)))
            row["t64_on"] = ss.timed(lambda: ss.force(on(spark, WORK)))
            if not on_only:
                row["ratio_off"] = round(
                    row["t64_off"] / max(row["t1_off"], 1e-9), 1
                )
            row["ratio_on"] = round(row["t64_on"] / max(row["t1_on"], 1e-9), 1)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            row["error"] = f"{type(exc).__name__}: {exc}"[:300]
        out["queries"][name] = row
        print(f"LEVER {name}: {row}", file=sys.stderr)
    print(json.dumps(out))
    import shutil

    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
