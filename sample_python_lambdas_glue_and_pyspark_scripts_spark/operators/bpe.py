"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the vocabulary-induction step of a training-data
pipeline, built so the corpus is touched exactly once.

Scale design: BPE statistics depend only on (unique word, count), so
training runs on the VOCAB table — one corpus pass builds it (map-side
tokenize + |vocab|-sized groupBy), then every merge round is a
vocab-sized pair count (explode adjacent symbol pairs weighted by word
count → groupBy pair → argmax). Only the single winning pair per round
reaches the driver (bounded control-plane read, one row per merge);
the symbol table itself never leaves the cluster. Round-over-round
lineage is truncated with lazy localCheckpoints (the kmeans/clustering
pattern — an iterative plan otherwise doubles per round).

Application is a broadcast/shuffle JOIN, not per-row merge replay: the
trained vocab doubles as a segmentation table (word → BPE tokens);
``bpe_segment`` joins document words against it, and out-of-vocabulary
words fall back to character symbols (the standard cold-path; at scale
extend the seg table incrementally instead of re-deriving per query).

The reference engine has no tokenizer surface at all (SURVEY.md §1.1);
this extends the training-data side of the house. Determinism: ties in
pair frequency break on the lexicographically smallest pair, so the
merge sequence is reproducible run-to-run and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _c, words
from .util import ensure_parallelism

END_OF_WORD = "</w>"


def word_vocab(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """One corpus pass → (word, n) vocab table with initial character
    symbols (+ ``</w>`` terminator): the only corpus-sized step."""
    tok = ensure_parallelism(df).select(
        F.explode(words(F.coalesce(_c(text_col), F.lit("")))).alias("word")
    )
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        vocab = vocab.filter(F.col("n") >= min_count)
    syms = F.concat(
        F.split(F.col("word"), "").cast("array<string>"),
        F.array(F.lit(END_OF_WORD)),
    )
    return vocab.select("word", "n", syms.alias("syms"))


def _adjacent_pairs(syms: Column) -> Column:
    """struct(a, b) for each adjacent symbol pair (empty when < 2)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Left-greedy non-overlapping replacement of adjacent (a, b) with
    a+b, as a single JVM-side fold: the accumulator carries (done
    symbols, one unflushed symbol); each step either completes a merge
    or flushes the carried symbol."""
    la, lb = F.lit(a), F.lit(b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    step = lambda acc, s: F.when(  # noqa: E731
        acc["prev"].eqNullSafe(la) & (s == lb),
        F.struct(
            F.concat(acc["out"], F.array(F.concat(la, lb))).alias("out"),
            F.lit(None).cast("string").alias("prev"),
        ),
    ).otherwise(
        F.struct(
            F.when(
                acc["prev"].isNull(), acc["out"]
            ).otherwise(F.concat(acc["out"], F.array(acc["prev"]))).alias("out"),
            s.alias("prev"),
        )
    )
    finish = lambda acc: F.when(  # noqa: E731
        acc["prev"].isNull(), acc["out"]
    ).otherwise(F.concat(acc["out"], F.array(acc["prev"])))
    return F.aggregate(syms, init, step, finish)


def bpe_train(
    vocab: DataFrame, n_merges: int = 50
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges over a ``word_vocab`` table.

    Returns ``(merges, seg_table)``: the ordered merge list and the
    final (word, n, syms) segmentation table, still distributed. Stops
    early when no adjacent pair remains (fully merged corpus).

    Each round: count-weighted pair frequencies (vocab-sized shuffle),
    deterministic argmax (count desc, then pair asc), one-row collect,
    fold-merge applied map-side, lazy localCheckpoint to truncate the
    iterative lineage.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    merges: list[tuple[str, str]] = []
    cur = vocab
    for _ in range(n_merges):
        pair_counts = (
            cur.select(F.col("n"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pair_counts.orderBy(
            F.col("cnt").desc(), F.col("p.a"), F.col("p.b")
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        cur = cur.select(
            "word", "n", _merge_pair(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=False)
    return merges, cur


def bpe_encode(
    df: DataFrame,
    seg_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize documents into actual BPE token SEQUENCES (not counts):
    ``(id_col, out_col array<string>)`` with tokens in document order.
    Out-of-vocabulary words fall back to character symbols + ``</w>``
    (the same cold path as :func:`bpe_segment`'s counting).

    Plan: posexplode the words (keeping word position), one keyed join
    against the (broadcastable) seg table, then re-assemble per doc with
    ``array_sort`` on the position — the flatten is
    ``aggregate(concat)`` over the position-ordered per-word arrays, all
    JVM-side. No merge replay at query time: the trained seg table IS
    the tokenizer, exactly as a production vocab file would be.
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col),
        F.posexplode(words(F.coalesce(_c(text_col), F.lit("")))).alias(
            "__pos", "word"
        ),
    )
    seg = seg_table.select(
        F.col("word").alias("__w"), F.col("syms").alias("__syms")
    )
    char_syms = F.concat(
        F.split(F.col("word"), "").cast("array<string>"),
        F.array(F.lit(END_OF_WORD)),
    )
    joined = tok.join(seg, tok["word"] == seg["__w"], "left").select(
        F.col(id_col),
        F.col("__pos"),
        F.coalesce(F.col("__syms"), char_syms).alias("__syms"),
    )
    per_doc = joined.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__pos"), F.col("__syms")))
        ).alias("__ws")
    )
    flat = F.aggregate(
        F.col("__ws"),
        F.array().cast("array<string>"),
        lambda acc, w: F.concat(acc, w["__syms"]),
    )
    # docs with zero words never appear in `tok`: restore them with an
    # empty token array so encode output covers every input doc
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                flat, F.array().cast("array<string>")
            ).alias(out_col),
        )
    )


def bpe_segment(
    df: DataFrame,
    seg_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained segmentation table: explode
    words, JOIN the (broadcastable) seg table, fall back to character
    symbols for out-of-vocabulary words. Returns
    ``(id_col, n_words, n_bpe_tokens)`` per document — token counts are
    what the packing/budget operators consume.

    Plan: one keyed join on the word (broadcast when the vocab is small
    enough, AQE decides), no Python, no merge replay at query time.
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(words(F.coalesce(_c(text_col), F.lit("")))).alias("word"),
    )
    seg = seg_table.select(
        F.col("word").alias("__w"), F.size("syms").alias("__k")
    )
    char_fallback = F.length(F.col("word")) + F.lit(1)  # chars + </w>
    joined = tok.join(seg, tok["word"] == seg["__w"], "left").select(
        F.col(id_col),
        F.coalesce(F.col("__k"), char_fallback).alias("__k"),
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("__k").cast("bigint").alias("n_bpe_tokens"),
    )
