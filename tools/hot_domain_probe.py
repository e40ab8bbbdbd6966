"""Hot-domain window-skew probe: what the salted per-group cap buys
when ONE domain holds most of the crawl (VERDICT r8 item 5 —
`cap_per_group` sorts each domain in one reducer, so a hot domain is a
straggler at 100 TB).

Setup (deterministic, generated into /tmp): a 48M-row corpus where
HOT_FRAC_PCT% of rows carry ONE hot domain and the rest spread
uniformly over 100k domains; cap n=10 under (rank_key DESC, doc_id
ASC) — a 32-char hash string order key, the URL/quality-tag ranking
shape that makes the straggler sort-bound rather than I/O-shadowed.

Three strategies over the same parquet input, each run twice (timing
the second, warm run); all must keep the identical row set (asserted
via count + checksum of kept doc_ids):

  plain    cap_per_group — one row_number window partitioned by domain:
           the hot domain's rows sort in ONE task
  salted   cap_per_group_salted (n_salts=16) — EVERY group two-phase
  routed   cap_per_group_hot_routed — count prefilter broadcasts the
           (tiny) hot list; cold domains keep the plain single-window
           plan, only the hot domain goes salted

Measured verdict (recorded in BASELINE.md): salted is the operative
lever — 1.48× at 94%-hot (plain 17.0 s → salted 11.5 s); routed's
count-prefilter re-pays ~2 input scans and lands back at plain
(17.4 s), so it only pays off over cached/materialized inputs.

Prints one JSON line; numbers land in BASELINE.md's scaling-probe
section. Run: python tools/hot_domain_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sampling import (
    cap_per_group,
    cap_per_group_hot_routed,
    cap_per_group_salted,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

N_ROWS = 48_000_000
N_DOMAINS = 100_000
HOT_DOMAIN = "hot.example.com"
HOT_FRAC_PCT = 94
CAP_N = 10
WORK = "/tmp/hot_domain_probe"


def build_inputs(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    # the order key is a 32-char hash string: per-domain top-n sorts on
    # a string comparator, like ranking by URL/quality-tag — this is
    # what makes the hot domain's single-task sort a measurable
    # straggler rather than an I/O-shadowed blip
    docs = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", F.lit(100)) < HOT_FRAC_PCT, F.lit(HOT_DOMAIN))
        .otherwise(
            F.concat(
                F.lit("site"),
                F.pmod(F.xxhash64("id"), F.lit(N_DOMAINS)).cast("string"),
                F.lit(".org"),
            )
        )
        .alias("domain"),
        F.md5(F.col("id").cast("string")).alias("rank_key"),
    )
    docs.repartition(16).write.parquet(f"{WORK}/docs")


def checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id")).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"])


def run_case(spark, fn):
    docs = spark.read.parquet(f"{WORK}/docs")
    out = None
    for _ in range(2):  # warm run timed
        t0 = time.time()
        out = checksum(fn(docs))
        elapsed = time.time() - t0
    return elapsed, out


def main():
    spark = get_spark(app_name="hot-domain-probe")
    build_inputs(spark)
    plain_t, plain_sum = run_case(
        spark,
        lambda d: cap_per_group(
            d, "domain", CAP_N, "rank_key", descending=True
        ),
    )
    salted_t, salted_sum = run_case(
        spark,
        lambda d: cap_per_group_salted(
            d, "domain", CAP_N, "rank_key", descending=True, n_salts=16
        ),
    )
    routed_t, routed_sum = run_case(
        spark,
        lambda d: cap_per_group_hot_routed(
            d, "domain", CAP_N, "rank_key", descending=True, n_salts=16
        ),
    )
    assert plain_sum == salted_sum == routed_sum, (
        plain_sum, salted_sum, routed_sum,
    )
    print(
        json.dumps(
            {
                "probe": "hot_domain_cap",
                "n_rows": N_ROWS,
                "hot_frac_pct": HOT_FRAC_PCT,
                "cap_n": CAP_N,
                "plain_sec": round(plain_t, 2),
                "salted_sec": round(salted_t, 2),
                "routed_sec": round(routed_t, 2),
                "routed_speedup_vs_plain": round(plain_t / routed_t, 2),
                "kept": plain_sum[0],
            }
        )
    )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
