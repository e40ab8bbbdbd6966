"""Streaming MinHash-LSH intake scaling probe: does per-batch admission
latency stay usable as the claimed-bucket history grows?

Setup (deterministic, generated into /tmp): 16 parquet files x 20k docs
(320k total) land in an input directory; the file-source stream drains
them one file per micro-batch (maxFilesPerTrigger=1, availableNow).
Doc text is ~30 pseudo-words derived from xxhash64(doc_id, i); 20% of
each non-first batch reuses the text of a doc one batch earlier, so the
intake must drop them against HISTORY (the claimed table), not just
within-batch.

The per-batch callback IS streaming_minhash_dedup's (make_batch_fn),
wrapped with wall-clock timing — the probe cannot drift from the
production path. What the timings answer: the claimed
table is rescanned every batch and grows linearly with admitted docs,
so is the per-batch cost flat, linear, or worse? The table is tiny
relative to the corpus ((band_id, hash) rows only), so the expected
shape is near-flat with a shallow linear tail — the probe pins where
"compact + bucket by band_hash" (the documented scale lever) starts to
matter.

Prints one JSON line; numbers land in BASELINE.md.
Run: python tools/streaming_minhash_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.incremental import (
    read_file_stream,
    run_incremental,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.minhash_dedup import (
    make_batch_fn,
)

N_BATCHES = 16
DOCS_PER_BATCH = 20_000
WORDS = 30
VOCAB = 5_000
DUP_PCT = 20  # % of each non-first batch repeating a prior batch's text
WORK = "/tmp/smh_probe"

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
    ]
)


def _text_expr():
    """Pseudo-text from base_id: dup rows recompute an EARLIER doc's
    exact text, so cross-batch near-dup collapses to signature equality
    (bit-identical MinHash) and every intended dup must be dropped."""
    # dup rows (id%100 < DUP_PCT) point at id - BATCH + 30: same position
    # one batch earlier, shifted into the NON-dup class (30..50 mod 100)
    # — pointing at another dup-class id would chase a text that id
    # itself no longer carries (its text was rewritten one batch further
    # back), and nothing would ever collide
    base = F.when(
        (F.pmod("id", F.lit(100)) < DUP_PCT)
        & (F.col("id") >= DOCS_PER_BATCH),
        F.col("id") - DOCS_PER_BATCH + 30,
    ).otherwise(F.col("id"))
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base, F.lit(i)), F.lit(VOCAB)).cast("string"),
        )
        for i in range(WORDS)
    ]
    return F.concat_ws(" ", *words).alias("text")


def build_inputs(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    for b in range(N_BATCHES):
        lo = b * DOCS_PER_BATCH
        (
            spark.range(lo, lo + DOCS_PER_BATCH)
            .select(F.col("id").alias("doc_id"), _text_expr())
            .coalesce(1)
            .write.mode("append")
            .parquet(f"{WORK}/in")
        )


def main():
    spark = get_spark()
    build_inputs(spark)
    claimed_dir = f"{WORK}/claimed"
    kept_dir = f"{WORK}/kept"
    timings: list[tuple[int, float]] = []
    # time the REAL production callback, not a copy of it
    inner = make_batch_fn(WORK)

    def batch_fn(batch_df, batch_id):
        t0 = time.monotonic()
        inner(batch_df, batch_id)
        timings.append((batch_id, round(time.monotonic() - t0, 2)))

    stream = read_file_stream(
        spark, f"{WORK}/in", DOC_SCHEMA, max_files_per_trigger=1
    )
    q = run_incremental(stream, batch_fn, f"{WORK}/ckpt")
    q.awaitTermination()

    kept_n = spark.read.parquet(kept_dir).count()
    claimed_n = spark.read.schema(
        "band_id INT, band_hash STRING, batch_id STRING"
    ).parquet(claimed_dir).count()
    total = N_BATCHES * DOCS_PER_BATCH
    secs = [s for _, s in sorted(timings)]
    out = {
        "batches": len(secs),
        "docs_per_batch": DOCS_PER_BATCH,
        "total_docs": total,
        "kept": kept_n,
        "dropped_pct": round(100.0 * (total - kept_n) / total, 2),
        "per_batch_sec": secs,
        "first4_avg_sec": round(sum(secs[:4]) / 4, 2),
        "last4_avg_sec": round(sum(secs[-4:]) / 4, 2),
        "claimed_rows": claimed_n,
    }

    # incremental-maintenance lever: compact_claimed merges the
    # N_BATCHES tiny per-batch claim partitions into one distinct
    # partition (stream stopped — the documented protocol). Measured:
    # compaction cost, the history-scan time a batch pays before vs
    # after, and the file-count collapse that drives it.
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.minhash_dedup import (
        _read_claimed,
        compact_claimed,
    )

    def history_scan_sec() -> float:
        t0 = time.monotonic()
        _read_claimed(spark, claimed_dir, N_BATCHES).count()
        return round(time.monotonic() - t0, 2)

    def claim_files() -> int:
        return sum(
            len([f for f in files if f.endswith(".parquet")])
            for _, _, files in os.walk(claimed_dir)
        )

    out["history_scan_before_sec"] = history_scan_sec()
    out["claim_files_before"] = claim_files()
    t0 = time.monotonic()
    rows_before, rows_after = compact_claimed(spark, WORK, N_BATCHES)
    out["compact_sec"] = round(time.monotonic() - t0, 2)
    out["history_scan_after_sec"] = history_scan_sec()
    out["claim_files_after"] = claim_files()
    out["compact_rows"] = [rows_before, rows_after]
    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
