"""Dedup-family division-of-labor probe: MEASURE which operator catches
which kind of planted overlap, instead of asserting it from the papers.

Corpus: the sf0.01 documents plus planted cases built from them —

- ``verbatim``      : full copies of existing docs (new ids)
- ``inclusion``     : an existing doc's text embedded verbatim inside a
                      larger unique wrapper (tiny Jaccard, large span)
- ``span25``        : a 25-token run lifted from an existing doc spliced
                      between unique halves
- ``near``          : an existing doc with every 10th token replaced
                      (high Jaccard, NO long verbatim run)
- ``unique``        : fresh text sharing nothing (false-positive probe)

Detectors (each asked: which planted ids do you flag?):

- exact dedup        (``exact_dedup_groups`` — fingerprint equality)
- MinHash-LSH        (``minhash_dedup_pairs`` t=0.5 — Jaccard proxy)
- ExactSubstr L=20   (``exactsubstr_removals`` — any removal extent)
- winnowing k=4 w=4  (``winnow_matches`` min_shared=2 — sampled runs)

Expected shape (the claims COVERAGE.md makes, now measured): exact
catches only verbatim; LSH catches verbatim+near but NOT inclusion
(Jaccard of a small doc in a big wrapper is tiny); ExactSubstr catches
verbatim+inclusion+span25 but NOT near (no >= 20-token run survives
every-10th-token corruption); winnowing ≈ ExactSubstr at its
granularity. ``unique`` must be 0 for everyone.

SOLO run. Usage: python tools/overlap_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as DD,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_PER_CASE = 25
BASE_ID = 1_000_000


def build_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # plant only from docs long enough that every case is detectable in
    # principle (>= 60 tokens: a 25-token span and >= 20-token windows
    # always exist) — otherwise fixture shortness reads as detector miss
    long_docs = docs.filter(
        F.size(F.split(F.col("text"), " ")) >= 60
    )
    src = [
        r for r in long_docs.orderBy("doc_id").limit(N_PER_CASE * 4).collect()
    ]
    planted, truth = [], {}

    def add(case, i, text):
        pid = BASE_ID + len(planted)
        planted.append((pid, text))
        truth.setdefault(case, []).append(pid)

    for i in range(N_PER_CASE):
        base = src[i]["text"]
        toks = base.split()
        add("verbatim", i, base)
        add("inclusion", i,
            " ".join(f"wrapa{i}w{j}" for j in range(120)) + " " + base
            + " " + " ".join(f"wrapb{i}w{j}" for j in range(120)))
        half = src[N_PER_CASE + i]["text"].split()
        span = src[2 * N_PER_CASE + i]["text"].split()[10:35]
        add("span25", i,
            " ".join(half[: len(half) // 2])
            + " " + " ".join(span) + " "
            + " ".join(f"tail{i}w{j}" for j in range(30)))
        corrupted = [
            (t if j % 10 else f"corr{i}x{j}") for j, t in enumerate(toks)
        ]
        add("near", i, " ".join(corrupted))
        add("unique", i, " ".join(f"solo{i}w{j}" for j in range(150)))
    pdf = spark.createDataFrame(planted, "doc_id BIGINT, text STRING")
    return docs.unionByName(pdf).localCheckpoint(eager=True), truth


def main() -> None:
    spark = get_spark(app_name="overlap-probe")
    corpus, truth = build_corpus(spark)
    planted_ids = {i for ids in truth.values() for i in ids}

    flagged: dict[str, set] = {}

    groups = DD.exact_dedup_groups(corpus)
    dup_ids = (
        corpus.select("doc_id", DD.fingerprint("text").alias("fp"))
        .join(groups.filter(F.col("n_docs") >= 2).select("fp"), "fp")
        .select("doc_id")
    )
    flagged["exact"] = {r["doc_id"] for r in dup_ids.collect()}

    pairs = DD.minhash_dedup_pairs(corpus, threshold=0.5)
    lsh = set()
    for r in pairs.select("a", "b").collect():
        lsh.add(r["a"]); lsh.add(r["b"])
    flagged["minhash_lsh_t05"] = lsh

    rem = DD.exactsubstr_removals(corpus, min_tokens=20)
    flagged["exactsubstr_L20"] = {
        r["doc_id"] for r in rem.select("doc_id").distinct().collect()
    }

    wm = DD.winnow_matches(corpus, k=4, w=4, min_shared=2)
    wn = set()
    for r in wm.select("doc_a", "doc_b").collect():
        wn.add(r["doc_a"]); wn.add(r["doc_b"])
    flagged["winnow_k4w4"] = wn

    out = {"n_per_case": N_PER_CASE, "sf_dir": SF_DIR, "recall": {}}
    for det, ids in flagged.items():
        ids &= planted_ids
        out["recall"][det] = {
            case: round(len(ids & set(case_ids)) / len(case_ids), 2)
            for case, case_ids in sorted(truth.items())
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
