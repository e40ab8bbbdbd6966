"""Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model), the second published tokenizer family
next to BPE (``operators/bpe.py``), built on the same scale shape: the
corpus is touched EXACTLY ONCE.

Scale design (the bpe.py precedent): unigram statistics depend only on
(unique word, count), so training runs on the VOCAB table — one corpus
pass builds it (map-side tokenize + |vocab|-sized groupBy). The piece
inventory is a bounded MODEL artifact (≤ ``seed_size`` rows), so the
only driver reads are model-sized (the k-sized control-read rule);
E-steps run distributed over the vocab table with the piece log-probs
broadcast.

Algorithm (deterministic, hard-EM variant):

1. **Seed** — every substring of every word up to ``max_piece_len``,
   count-weighted; keep the top ``seed_size`` by (count DESC, piece
   ASC) plus ALL single characters (the coverage guarantee — every
   word stays segmentable through every prune).
2. **E-step** — Viterbi (hard) EM: each unique word is segmented by
   dynamic programming under the current piece log-probs (ties break
   to the LONGEST piece at each boundary — replace only on strictly
   greater score while scanning split points left-to-right), and each
   piece on the best path earns the word's integer count. Integer
   partial counts sum exactly, so the E-step is partition-order-free —
   the determinism trick that makes the whole fit reproducible without
   any float-rounding contract (the full forward-backward EM of the
   paper accumulates FLOAT expected counts, whose cross-partition sum
   order is not deterministic; hard EM is the published Viterbi
   variant, and SentencePiece itself converges to Viterbi use at
   inference).
3. **M-step** — driver-side (model-sized): ``logp = ln(cnt / total)``
   over the E-step counts; non-char pieces with zero count drop
   immediately (unused inventory), zero-count single chars stay with
   the smoothing floor ``ln(0.5 / total)``.
4. **Prune** — shrink the inventory by ``prune_frac`` per round toward
   ``vocab_size`` keeping the highest-count pieces ((count DESC,
   piece ASC) order, single chars always kept), re-running EM between
   rounds — the paper's iterative prune loop with the count criterion
   standing in for the likelihood-loss criterion (equal up to ties on
   this hard-EM objective: a piece's Viterbi count IS its contribution
   mass).

Segmentation (``unigram_encode``) is the same Viterbi with the trained
model broadcast; characters never seen in training fall back to a
fixed ``UNK_LOGP`` floor so any text remains segmentable.

The per-word DP runs in Python over Arrow batches (``mapInPandas``) —
the documented custom-operator escape hatch: the lattice DP is not
expressible in Catalyst built-ins, the input is the BOUNDED unique-word
vocab (never the corpus), and the per-batch loop is amortized across
Arrow-sized batches. No SQL oracle (data-dependent float model, same
as BPE) — property-tested against an independent pure-Python reference
plus determinism pins (``tests/test_unigram.py``).

Reference scope note: the reference engine has no tokenizer surface at
all (SURVEY.md §1.1); this extends the training-data side of the
house.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WORD_REGEX, _c, words
from .util import ensure_parallelism

UNK_LOGP = -100.0


def word_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """One corpus pass → (word, n): the only corpus-sized step (the
    ``bpe.word_vocab`` shape without the symbol column)."""
    tok = ensure_parallelism(df).select(
        F.explode(words(F.coalesce(_c(text_col), F.lit("")))).alias("word")
    )
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        vocab = vocab.filter(F.col("n") >= min_count)
    return vocab


def seed_pieces(
    vocab: DataFrame, max_piece_len: int = 4, seed_size: int = 1000
) -> DataFrame:
    """Seed inventory: count-weighted substrings up to ``max_piece_len``
    (all occurrences, overlapping), top ``seed_size`` by (count DESC,
    piece ASC), UNIONED with every single character (chars ride along
    with their true counts whether or not they make the top-K).
    Entirely DataFrame ops — explode substrings via a length×start
    sequence transform, one |pieces|-sized groupBy."""
    ml = int(max_piece_len)
    if ml < 1:
        raise ValueError("max_piece_len must be >= 1")
    w = F.col("word")
    # all (start, len) substrings: flatten a nested transform
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(ml), F.length(w) - i + 1)
                ),
                lambda l: F.substring(w, i, l),
            ),
        )
    )
    counts = (
        vocab.select(F.col("n"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
    )
    topk = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(int(seed_size))
    )
    chars = counts.filter(F.length("piece") == 1)
    return topk.unionByName(chars)


def _viterbi_py(
    word: str, logp: dict, max_len: int, unk: float = UNK_LOGP
) -> list:
    """Best segmentation of ``word`` under piece log-probs: DP over end
    positions; at each end, split points scan left-to-right and replace
    only on STRICTLY greater score, so ties break to the smallest start
    = the LONGEST piece. Single characters absent from the model take
    the ``unk`` floor (coverage)."""
    n = len(word)
    best = [0.0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        b_score, b_j = None, 0
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = unk
                else:
                    continue
            s = best[j] + lp
            if b_score is None or s > b_score:
                b_score, b_j = s, j
        best[i], back[i] = b_score, b_j
    out, i = [], n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _estep_counts(
    vocab: DataFrame, logp: dict, max_piece_len: int
) -> dict:
    """Distributed hard-EM E-step: Viterbi-segment every unique word
    under the broadcast model, weight each best-path piece by the
    word's integer count, sum exactly. Returns the model-sized
    {piece: count} dict (driver read is bounded by the inventory)."""
    import pandas as pd  # noqa: F401  (worker-side)

    spark = vocab.sparkSession
    b = spark.sparkContext.broadcast((dict(logp), int(max_piece_len)))

    def gen(batches):
        import collections

        import pandas as pd

        lp, ml = b.value
        for pdf in batches:
            counter = collections.Counter()
            for word, n in zip(pdf["word"], pdf["n"]):
                for piece in _viterbi_py(word, lp, ml):
                    counter[piece] += int(n)
            if counter:
                yield pd.DataFrame(
                    {"piece": list(counter), "cnt": list(counter.values())}
                )

    agg = (
        vocab.select("word", "n")
        .mapInPandas(gen, "piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )
    try:
        return {r["piece"]: int(r["cnt"]) for r in agg.collect()}
    finally:
        # one broadcast per EM iteration — release it or repeated
        # unigram_train rounds accumulate driver/executor state
        b.unpersist()


def _mstep(counts: dict, inventory: list) -> dict:
    """Driver-side M-step over the model-sized count dict: ln(cnt /
    total); unused single chars keep the ln(0.5 / total) floor, unused
    multi-char pieces drop. Returns the new {piece: logp}."""
    total = sum(counts.values())
    if total == 0:
        raise ValueError("unigram: empty corpus — no pieces counted")
    out = {}
    for piece in inventory:
        c = counts.get(piece, 0)
        if c > 0:
            out[piece] = math.log(c / total)
        elif len(piece) == 1:
            out[piece] = math.log(0.5 / total)
    return out


def unigram_train(
    vocab: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 4,
    seed_size: int = 1000,
    n_em_iters: int = 2,
    prune_frac: float = 0.25,
) -> DataFrame:
    """Fit the unigram-LM piece inventory over a ``word_counts`` table
    (see module docstring for the algorithm and determinism argument).
    Returns the model as a DataFrame ``(piece, cnt, logprob)`` — the
    final E-step counts and log-probs; single characters are always
    present. Fully deterministic: same vocab table → same model."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if not (0.0 < prune_frac < 1.0):
        raise ValueError("prune_frac must be in (0, 1)")
    seed = seed_pieces(vocab, max_piece_len, seed_size).collect()
    total0 = sum(int(r["cnt"]) for r in seed)
    logp = {
        r["piece"]: math.log(int(r["cnt"]) / total0) for r in seed
    }
    counts = {r["piece"]: int(r["cnt"]) for r in seed}
    vocab = vocab.localCheckpoint(eager=True)
    while True:
        for _ in range(int(n_em_iters)):
            counts = _estep_counts(vocab, logp, max_piece_len)
            logp = _mstep(counts, list(logp))
        multi = [p for p in logp if len(p) >= 2]
        chars = [p for p in logp if len(p) == 1]
        if len(multi) + len(chars) <= int(vocab_size) or not multi:
            break
        target_multi = max(
            len(multi) - max(int(len(multi) * float(prune_frac)), 1),
            int(vocab_size) - len(chars),
            0,
        )
        if target_multi >= len(multi):
            # chars alone exceed vocab_size: coverage wins, stop here
            break
        keep = set(
            sorted(multi, key=lambda p: (-counts.get(p, 0), p))[:target_multi]
        )
        logp = {
            p: lp for p, lp in logp.items() if len(p) == 1 or p in keep
        }
    rows = sorted(logp.items())
    spark = vocab.sparkSession
    return spark.createDataFrame(
        [(p, int(counts.get(p, 0)), float(lp)) for p, lp in rows],
        "piece STRING, cnt BIGINT, logprob DOUBLE",
    )


def unigram_encode(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Viterbi-segment documents under a trained model: tokenize with
    the corpus WORD_REGEX convention, segment each word on the best
    path, concatenate in document order. Returns ``(id_col, out_col
    array<string>, n_pieces)``; characters unseen in training take the
    ``UNK_LOGP`` floor so every document is segmentable. The model is
    a bounded artifact: collected once, broadcast into the Arrow-batch
    segmenter. The id column keeps its INPUT dtype (the empty-schema
    lesson of ``ewma_state.read_ewma``: a hardcoded id type would hand
    string-keyed corpora a silently different schema)."""
    mrows = model.select("piece", "logprob").collect()
    logp = {r["piece"]: float(r["logprob"]) for r in mrows}
    max_len = max((len(p) for p in logp), default=1)
    id_type = dict(df.dtypes)[id_col]
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((logp, max_len))

    def gen(batches):
        import re

        import pandas as pd

        lp, ml = b.value
        rx = re.compile(WORD_REGEX)
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["__id"], pdf["__text"]):
                toks = []
                for w in rx.findall((text or "").lower()):
                    toks.extend(_viterbi_py(w, lp, ml))
                out.append((doc_id, toks, len(toks)))
            yield pd.DataFrame(
                out, columns=["__id", "__toks", "__n"]
            )

    src = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.coalesce(_c(text_col), F.lit("")).alias("__text"),
    )
    enc = src.mapInPandas(
        gen, f"__id {id_type}, __toks array<string>, __n long"
    )
    return enc.select(
        F.col("__id").alias(id_col),
        F.col("__toks").alias(out_col),
        F.col("__n").alias("n_pieces"),
    )
