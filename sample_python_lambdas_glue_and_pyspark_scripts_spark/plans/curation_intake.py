"""Streaming curation intake: the end-to-end pipeline a training-data
team runs against a continuously-arriving document crawl, composed
entirely from this engine's parts —

    file stream → Gopher/C4 quality rules → benchmark decontamination
    → cross-batch LSH near-dup admission → (optional) cross-batch
    ExactSubstr range rewriting → kept-doc sink
    + live HLL distinct-fingerprint state

Per micro-batch work (everything already individually oracle-checked /
probed batch-side):
- ``text.gopher_rules``: map-side rule battery, no shuffle;
- ``dedup.decontaminate``: benchmark gram set broadcast, corpus never
  content-shuffled;
- ``minhash_dedup.lsh_admit``: greedy admission against the persistent
  claimed-bucket state (idempotent per-epoch overwrites, crash-safe);
- kept docs land partitioned by epoch (same idempotent layout);
- ``sketch_state.make_hll_batch_fn``-style register write keeps a live
  "distinct normalized texts ever admitted" count without rescanning.

State layout under ``work_dir``: ``claimed/`` + ``kept/`` (from the
minhash intake), ``registers/`` (HLL), ``ckpt/`` (stream checkpoint) —
every write keyed by the micro-batch epoch, so replay after a crash
rewrites the same dirs and the MAX-merged registers are doubly safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import decontaminate
from ..operators.sketches import hll_sketch
from ..operators.text import fingerprint, gopher_rules
from ..streaming.exactsubstr_intake import _read_anchors, exactsubstr_admit
from ..streaming.incremental import run_incremental
from ..streaming.minhash_dedup import _read_claimed, lsh_admit


def make_intake_batch_fn(
    work_dir: str,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    hll_p: int = 12,
    shingle_n: int = 13,
    exactsubstr_min_tokens: int | None = None,
    c4_clean: dict | None = None,
):
    """Per-micro-batch callback, standalone so tests and probes drive
    the exact production path. ``benchmark`` is a STATIC frame (eval
    sets change rarely); its gram set broadcasts into every batch.

    ``c4_clean`` (a kwargs dict for ``text.c4_line_filter``; ``{}`` for
    the published defaults) enables the same STAGE 0 the batch cascade
    runs (``plans.curation_batch.curate_corpus``): line-level cleaning
    BEFORE any content key is computed, per batch — docs the C4 doc
    rules drop never reach the gram/bucket/anchor states, survivors
    carry the CLEANED text into decontamination, LSH admission, and
    ExactSubstr anchors (so streamed and batch-curated corpora agree on
    what "the text" is). Map-side only; adds no per-batch state.

    ``shingle_n`` follows the standard decontamination convention (13-gram
    overlap, matching ``dedup.decontaminate``'s default): a production
    intake must not drop every document sharing a single trigram with the
    benchmark. Tests shrink it to 3 to exercise hits on short fixtures.

    ``exactsubstr_min_tokens`` (optional) adds the Lee-et-al range
    rewriting stage AFTER admission: every admitted doc lands with
    ranges duplicating previously-SEEN admitted content removed
    (``streaming/exactsubstr_intake.exactsubstr_admit`` against the
    ``anchors/`` state; LSH-dropped docs never feed anchors). The kept
    sink then carries (text rewritten in place, n_tokens, n_removed)."""
    claimed_dir = f"{work_dir}/claimed"

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if c4_clean is not None:
            from ..operators.text import c4_line_filter

            flagged = c4_line_filter(batch_df, text_col=text_col, **c4_clean)
            batch_df = flagged.filter(F.col("keep")).select(
                *[
                    F.col("text_clean").alias(text_col) if c == text_col else c
                    for c in batch_df.columns
                ]
            )
        passed = (
            gopher_rules(batch_df, text_col=text_col, min_words=min_words)
            .filter(F.col("keep"))
            .select(*batch_df.columns)
        )
        clean = decontaminate(passed, benchmark, text_col, id_col, shingle_n=shingle_n)
        claimed = _read_claimed(spark, claimed_dir, batch_id)
        kept, new_buckets = lsh_admit(clean, claimed, text_col, id_col)
        # admission state first: a crash between the two writes must
        # err toward re-dropping, never toward double-admitting
        new_buckets.write.mode("overwrite").parquet(
            f"{claimed_dir}/batch_id={batch_id}"
        )
        if exactsubstr_min_tokens:
            hist = _read_anchors(spark, work_dir, batch_id)
            rewritten, new_anchors = exactsubstr_admit(
                kept, hist, text_col, id_col, exactsubstr_min_tokens
            )
            new_anchors.write.mode("overwrite").parquet(
                f"{work_dir}/anchors/batch_id={batch_id}"
            )
            kept = (
                kept.drop(text_col)
                .join(
                    rewritten.select(
                        id_col,
                        F.col("text_dedup").alias(text_col),
                        "n_tokens",
                        "n_removed",
                    ),
                    id_col,
                )
            )
        kept.write.mode("overwrite").parquet(
            f"{work_dir}/kept/batch_id={batch_id}"
        )
        admitted_fps = kept.select(fingerprint(text_col).alias("fp"))
        hll_sketch(admitted_fps, "fp", hll_p).write.mode("overwrite").parquet(
            f"{work_dir}/registers/batch_id={batch_id}"
        )

    return batch_fn


def run_curation_intake(
    stream_df: DataFrame,
    work_dir: str,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    hll_p: int = 12,
    shingle_n: int = 13,
    available_now: bool = True,
    exactsubstr_min_tokens: int | None = None,
    c4_clean: dict | None = None,
) -> StreamingQuery:
    """Wire the intake callback into the incremental runner (availableNow
    drains the backlog exactly once; continuous mode just flips the
    flag)."""
    return run_incremental(
        stream_df,
        make_intake_batch_fn(
            work_dir, benchmark, text_col, id_col, min_words, hll_p,
            shingle_n, exactsubstr_min_tokens, c4_clean=c4_clean,
        ),
        f"{work_dir}/ckpt",
        available_now=available_now,
    )
