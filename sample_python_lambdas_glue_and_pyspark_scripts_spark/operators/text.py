"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (SURVEY.md §7.1 M6): language ID, quality
scoring, token counting, and document fingerprinting over a ``documents``
table. Everything is native Spark column expressions — JVM-side,
whole-stage codegen, no Python in the hot path — so these run at
100 TB as pure map-side projections (no shuffle at all).

All primitives are chosen for cross-engine determinism (md5-based
hashing, RE2/Java-compatible regexes) so every operator has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import ensure_parallelism

# BPE-ish word/punctuation tokenizer: runs of word chars, or single
# non-word non-space symbols (each punctuation mark is its own token).
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
# plain word tokenizer for shingles / language ID
WORD_REGEX = r"[a-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "it", "a"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "du"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Tokenize into words+punctuation (BPE-ish regex)."""
    return F.regexp_extract_all(_c(col), F.lit(TOKEN_REGEX), 0)


def words(col: Column | str) -> Column:
    """Lowercased alphanumeric word tokens."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(WORD_REGEX), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return _count_matches(F.lower(_c(col)), pat)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature set: lengths, ratios, counts.

    Ratios are rounded to 6dp for cross-engine comparability.
    """
    c = _c(text_col)
    n_chars = F.length(c)
    n_tok = token_count(c)
    n_words = F.size(words(c))
    n_punct = _count_matches(c, r"[.,!?;:]")
    n_stop = stopword_count(c)
    return df.select(
        "*",
        n_chars.alias("stat_n_chars"),
        n_tok.alias("stat_n_tokens"),
        n_words.alias("stat_n_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("stat_punct_ratio"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 6).alias("stat_stopword_ratio"),
        F.round(n_chars / F.greatest(n_words, F.lit(1)), 6).alias("stat_chars_per_word"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score (length + stopword presence + sane
    punctuation), the usual pre-training heuristic filter shape."""
    stats = text_stats(df, text_col)
    len_ok = F.when(F.col("stat_n_chars").between(50, 100000), 1.0).otherwise(0.0)
    stop_ok = F.when(F.col("stat_stopword_ratio") >= 0.01, 1.0).otherwise(0.0)
    punct_ok = F.when(F.col("stat_punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    return stats.withColumn(
        "quality_score", F.round((len_ok + stop_ok + punct_ok) / 3.0, 6)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax of per-language stopword counts,
    ties broken by fixed language order, 'und' when all scores are 0."""
    c = F.lower(_c(text_col))
    scores = {
        lang: _count_matches(c, r"\b(" + "|".join(sw) + r")\b")
        for lang, sw in LANG_STOPWORDS.items()
    }
    # argmax: walk languages in declaration order; strictly-greater
    # replaces, so earlier languages win ties.
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_STOPWORDS:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.select("*", best.alias("lang_pred"))


def _word_ngrams(toks: Column, n: int) -> Column:
    """Non-distinct word n-grams (order-preserving; empty list when the
    doc has fewer than n words). The distinct variant for shingling lives
    in dedup.word_shingles."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_run_count(sorted_g: Column) -> Column:
    """Occurrences of the most frequent element of a SORTED list (0 for
    empty). Single O(L) run-length ``aggregate`` pass — the naive
    count-each-distinct-via-filter formulation is O(L²) per document and
    melts on long docs (10k words → 10⁸ comparisons/doc); sort + scan is
    the shape that survives arbitrary document lengths. No shuffle (the
    explode + groupBy alternative shuffles every n-gram of the corpus)."""
    step = lambda acc, x: F.struct(  # noqa: E731 — struct-state fold
        x.alias("prev"),
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
        .otherwise(F.lit(1))
        .alias("run"),
        F.greatest(
            acc["best"],
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(
        sorted_g,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda acc: acc["best"],
    )


def _singleton_count(sorted_g: Column) -> Column:
    """Number of distinct elements occurring exactly once in a SORTED
    list — same single-pass run-length shape as ``_max_run_count``."""
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
        .otherwise(F.lit(1))
        .alias("run"),
        (
            acc["singles"]
            + F.when(
                acc["prev"].isNotNull()
                & ~x.eqNullSafe(acc["prev"])
                & (acc["run"] == 1),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("singles"),
    )
    return F.aggregate(
        sorted_g,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("singles"),
        ),
        step,
        lambda acc: acc["singles"]
        + F.when(acc["prev"].isNotNull() & (acc["run"] == 1), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (quality filters
    for LLM training corpora): the fraction of bigram occurrences taken
    by the single most frequent bigram (``top_bigram_frac``), the
    fraction of trigram occurrences that are duplicates
    (``dup_trigram_frac``), and the most-frequent-word fraction
    (``max_word_frac``). High values mark boilerplate/looping text.

    Map-side only (0 shuffles), native expressions throughout. Token and
    n-gram arrays are materialized in their own projections first —
    Catalyst does not CSE across nested higher-order functions, so
    inlining them would re-tokenize per signal.
    """
    # NULL text behaves as empty (all fractions 0.0, matching the SQL
    # oracle); each array is materialized exactly once per stage — sizes
    # derive from the sorted arrays, never from a second _word_ngrams
    # evaluation (no CSE across nested higher-order functions).
    toks = df.select(
        F.col(id_col), words(F.coalesce(_c(text_col), F.lit(""))).alias("__w")
    ).select(
        F.col(id_col),
        F.array_sort("__w").alias("__ws"),
        F.array_sort(_word_ngrams(F.col("__w"), 2)).alias("__g2s"),
        F.array_sort(_word_ngrams(F.col("__w"), 3)).alias("__g3s"),
    )
    n_w = F.size("__ws")
    n2 = F.size("__g2s")
    n3 = F.size("__g3s")
    return toks.select(
        F.col(id_col),
        F.round(
            _max_run_count(F.col("__g2s")) / F.greatest(n2, F.lit(1)), 6
        ).alias("top_bigram_frac"),
        F.round(
            (n3 - _singleton_count(F.col("__g3s"))) / F.greatest(n3, F.lit(1)),
            6,
        ).alias("dup_trigram_frac"),
        F.round(
            _max_run_count(F.col("__ws")) / F.greatest(n_w, F.lit(1)), 6
        ).alias("max_word_frac"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style LM quality signal without an external model: each
    doc's mean log-probability under the corpus's OWN unigram language
    model (low = rare-token/gibberish text, high = typical text).
    Returns (id_col, n_tokens, mean_logprob) — rounded to 6dp.

    Scale shape: one groupBy(token) builds the vocabulary (shuffle is
    |vocab|-sized after map-side partial aggregation, not |tokens|); the
    corpus total joins back as a broadcast scalar (the TPC-H q11
    cross-join-aggregate shape); token→count is one shuffle join keyed on
    the token; the per-doc mean is the final keyed aggregation. No
    Python, no driver collect.
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col), F.explode(words(F.coalesce(_c(text_col), F.lit("")))).alias("__tok")
    )
    # vocab/total share tok's lineage with the probe side — qualify every
    # reference or Spark flags the re-occurring internal columns ambiguous
    vocab = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__n")).alias("v")
    total = vocab.agg(F.sum("__n").cast("double").alias("__N")).alias("tt")
    t = tok.alias("t")
    scored = (
        t.join(vocab, F.col("t.__tok") == F.col("v.__tok"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col(f"t.{id_col}").alias(id_col),
            F.log(F.col("v.__n") / F.col("tt.__N")).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed text.

    The normalize-then-hash shape used for exact dedup; md5 keeps it
    oracle-comparable (rolling/xxhash variants are engine-specific).
    """
    norm = F.regexp_replace(F.trim(F.lower(_c(col))), r"\s+", " ")
    return F.md5(norm)


def top_terms(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus vocabulary: the k most frequent word tokens.

    Explode → count → top-k. The explode is map-side; the count is one
    shuffle keyed on the term with map-side partial aggregation, so the
    shuffled volume is |vocabulary|, not |tokens| — the property that
    makes corpus-level vocab viable at 100 TB. Cut is deterministic:
    total order (count desc, term asc).
    """
    counts = (
        df.select(F.explode(words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.orderBy(F.col("n").desc(), "term").limit(k)


# scrub patterns chosen to behave identically under Java regex (Spark)
# and RE2-ish (DuckDB): no backrefs, no lookaround
SCRUB_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
    (r"[0-9]+", "<NUM>"),
)


def scrub_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "scrubbed",
    patterns: tuple[tuple[str, str], ...] = SCRUB_PATTERNS,
) -> DataFrame:
    """PII-style masking: replace pattern matches with placeholder tags
    (emails before bare numbers so '<NUM>@host' never forms). Pure
    map-side projection — composes with scan pushdown, no shuffle."""
    c = _c(text_col)
    for pat, tag in patterns:
        c = F.regexp_replace(c, pat, tag)
    return df.withColumn(out_col, c)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Per-document top-k TF-IDF terms: (doc_id, term, tfidf).

    tf = raw in-document term count; idf = ln(N / df_term) with N = all
    documents (tokenless docs count in N, contribute no rows). Ranking
    cuts on the ROUNDED score with a term tiebreak so the top-k boundary
    is identical across engines.

    Plan shape: the tokenize+explode is map-side; (doc, term) counts
    partial-aggregate into one shuffle; document frequency is a window
    count over that SAME relation (partitionBy term — one more shuffle,
    but the expensive tokenization evaluates exactly once; the
    aggregate-then-self-join form re-tokenizes, because column pruning
    makes the two aggregate subtrees non-identical and defeats
    ReusedExchange); the per-doc top-k window shuffles on doc id.
    Shuffled volume is distinct (doc, term) pairs, never raw tokens.
    """
    dt = (
        df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    wt = Window.partitionBy("term")
    scored = (
        dt.withColumn("df_t", F.count(F.lit(1)).over(wt))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")), round_to
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tfidf")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: str | list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009; the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` IDF so every term score stays
    positive): ``(doc_id, bm25)``, optionally cut to the global top-k.

    The lexical half of the similarity-search shelf (the embedding half
    is ``similarity.cosine_topk``/``ann_ivf_topk``). Query terms are a
    handful of literals, so per-term tf lands as map-side array
    ``filter``+``size`` over ONE materialized token array — no explode,
    no (doc, term) shuffle at all.

    Plan shape: pass 1 is a single partial-aggregated corpus aggregate
    (N, avgdl, per-term document frequencies — one output row,
    broadcast back); pass 2 is pure map-side scoring. ``top_k`` uses
    ``orderBy().limit()``, which Spark executes as
    TakeOrderedAndProject: per-partition heaps of k rows merged on the
    driver — never a single-partition ranking window.

    Determinism contract (parity kit): idf and avgdl round to 6dp before
    use, the final score rounds to 6dp, and the top-k cut orders by the
    ROUNDED score with an id tiebreak — identical across engines.
    """
    if isinstance(query_terms, str):
        import re

        query_terms = re.findall(WORD_REGEX, query_terms.lower())
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("bm25_scores: empty query")
    # token array in its own projection: Catalyst does not CSE across
    # nested higher-order functions (CLAUDE.md), so the m per-term
    # filters must reference one materialized array
    tokd = ensure_parallelism(df).select(
        F.col(id_col), words(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks")
    )
    def _term_eq(term: str):
        # closure, NOT a default arg: F.filter treats a two-parameter
        # lambda as (element, index) and would pass the index into it
        return lambda x: x == F.lit(term)

    base = tokd.select(
        F.col(id_col),
        F.size("__toks").cast("double").alias("__dl"),
        *[
            F.size(F.filter(F.col("__toks"), _term_eq(t)))
            .cast("double")
            .alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.round(F.avg("__dl"), 6).alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("bigint"))
            .cast("double")
            .alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("__dl") / F.greatest(F.col("__avgdl"), F.lit(1e-9))
    )
    expr = None
    for i in range(len(terms)):
        idf = F.round(
            F.log(
                (F.col("__n") - F.col(f"__df{i}") + 0.5)
                / (F.col(f"__df{i}") + 0.5)
                + 1.0
            ),
            6,
        )
        term_score = (idf * (F.col(f"__tf{i}") * F.lit(k1 + 1.0))) / (
            F.col(f"__tf{i}") + norm
        )
        expr = term_score if expr is None else expr + term_score
    out = scored.select(F.col(id_col), F.round(expr, 6).alias("bm25"))
    if top_k is not None:
        out = out.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(
            int(top_k)
        )
    return out


def build_bm25_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the BM25 serving index: ``(stats, doclen, postings)`` —
    the persisted-index split for ranked retrieval, mirroring
    ``similarity.build_ivf_index`` / ``dedup.build_corpus_index``.

    ``bm25_scores`` re-tokenizes the whole corpus per query batch; at
    100 TB that is a full corpus pass per query. These three tables are
    computed ONCE (tokenize + one (doc, term) shuffle — the classic
    inverted-index build) and every later query batch is served from
    them via :func:`bm25_scores_indexed` with the corpus text never
    read again. Persist ``postings`` partitioned/bucketed on ``term``
    (query-term filters become partition prunes), ``doclen`` on
    ``id_col``; after each admitted batch, extend with
    :func:`extend_bm25_index` (delta-sized — the corpus build is never
    re-paid).

    Schemas: ``stats(n_docs double, total_dl double)`` one row
    (``total_dl`` not avgdl, so extension stays exact — doc lengths are
    integral, their double sum is order-independent);
    ``doclen(id_col, dl double)`` one row per doc (zero-token docs
    included — they still score 0 in every query);
    ``postings(id_col, term string, tf double)`` one row per (doc,
    distinct term).
    """
    tokd = ensure_parallelism(df).select(
        F.col(id_col),
        words(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"),
    )
    # r13 opt (guide §1.2): ONE tokenize pass. The serve side references
    # the index tables several times (postings twice through the term
    # prune + df aggregate, doclen once, stats once), and each lazy
    # table re-ran the corpus tokenize — an inline build+serve paid it
    # 4-5x. postings materializes off the single tokenize;
    # doclen derives from the CACHED postings (dl = Σ tf over the doc's
    # terms — tf values are integral doubles, their sum is exact and
    # order-independent, so dl is value-identical to size(__toks)) plus
    # an id-only left join so zero-token docs keep their dl=0 row; stats
    # reads cached doclen. Eager checkpoints = the build runs once,
    # every serve reference reads cached blocks (the persisted-index
    # posture this docstring already prescribes, applied in-session).
    postings = (
        tokd.select(F.col(id_col), F.explode("__toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .localCheckpoint(eager=True)
    )
    doclen = (
        df.select(id_col)
        .join(
            postings.groupBy(id_col).agg(F.sum("tf").alias("__dl")),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("__dl"), F.lit(0.0)).alias("dl"),
        )
        .localCheckpoint(eager=True)
    )
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    return stats, doclen, postings


def extend_bm25_index(
    index: tuple[DataFrame, DataFrame, DataFrame],
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incrementally maintain the BM25 index: tokenize only the NEW
    batch and append — delta-sized, the corpus-wide build is never
    re-paid. Result is EXACTLY what a from-scratch build over the union
    produces (pinned by test): postings/doclen rows are per-doc
    deterministic, and the stats sums are exact because doc lengths are
    integral doubles (order-independent addition). Assumes new doc ids
    are disjoint from the indexed corpus (same contract as
    ``extend_corpus_index``)."""
    stats, doclen, postings = index
    s2, d2, p2 = build_bm25_index(new_docs, text_col, id_col)
    merged_stats = (
        stats.unionByName(s2)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_dl").alias("total_dl"),
        )
    )
    return (
        merged_stats,
        doclen.unionByName(d2),
        postings.unionByName(p2),
    )


def bm25_scores_indexed(
    index: tuple[DataFrame, DataFrame, DataFrame],
    query_terms: str | list[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """BM25 ranked retrieval SERVED from a prebuilt index — same output
    contract (and bit-identical scores, pinned by test) as
    :func:`bm25_scores`, with the corpus text never touched.

    Serve plan: postings filtered to the query terms (a partition prune
    when postings is stored partitioned on term) feed TWO tiny
    aggregates — per-doc tf pivot and the one-row per-term document
    frequencies — then ``doclen`` LEFT-joins the matched docs so every
    indexed document scores (zero for no-match, as in ``bm25_scores``),
    and the one-row stats/df frames broadcast onto it. Corpus-sized
    work at serve time is exactly one scan of the narrow ``doclen``
    table; everything term-sized is query-pruned.
    """
    if isinstance(query_terms, str):
        import re

        query_terms = re.findall(WORD_REGEX, query_terms.lower())
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("bm25_scores_indexed: empty query")
    stats, doclen, postings = index
    filt = postings.filter(F.col("term").isin(terms))
    matched = filt.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ]
    )
    dfs = filt.agg(
        *[
            F.sum((F.col("term") == t).cast("bigint"))
            .cast("double")
            .alias(f"__df{i}")
            for i, t in enumerate(terms)
        ]
    )
    scored = (
        doclen.join(matched, id_col, "left")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfs))
    )
    avgdl = F.round(F.col("total_dl") / F.col("n_docs"), 6)
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl") / F.greatest(avgdl, F.lit(1e-9))
    )
    expr = None
    for i in range(len(terms)):
        df_i = F.coalesce(F.col(f"__df{i}"), F.lit(0.0))
        tf_i = F.coalesce(F.col(f"__tf{i}"), F.lit(0.0))
        idf = F.round(
            F.log(
                (F.col("n_docs") - df_i + 0.5) / (df_i + 0.5) + 1.0
            ),
            6,
        )
        term_score = (idf * (tf_i * F.lit(k1 + 1.0))) / (tf_i + norm)
        expr = term_score if expr is None else expr + term_score
    out = scored.select(F.col(id_col), F.round(expr, 6).alias("bm25"))
    if top_k is not None:
        out = out.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(
            int(top_k)
        )
    return out


def bm25_topk_batch(
    index: tuple[DataFrame, DataFrame, DataFrame],
    queries: DataFrame,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 5,
) -> DataFrame:
    """Batch BM25 serving: a TABLE of queries (``query_id, terms
    array<string>``) against the prebuilt index, top-k per query in ONE
    job — the realistic retrieval shape at scale (one postings pass
    serves the whole query batch; per-query jobs would re-pay the probe
    per query).

    Returns ``(query_id, doc_id, bm25)`` — only docs matching ≥1 query
    term (standard IR semantics; with the Lucene +1 IDF every match
    scores > 0, so this equals ``bm25 > 0``), ranked per query by
    (rounded score desc, doc id asc), top ``top_k``.

    Plan: query terms explode + dedup (query-batch-sized), semi-join
    prunes postings to needed terms, per-term df is one tiny aggregate
    over the pruned postings, then ONE keyed (query, doc) aggregate sums
    per-term scores and a per-query window takes top-k. Doc lengths join
    from ``doclen`` on the pruned match set only — the full corpus-sized
    doclen scan of ``bm25_scores_indexed`` is not needed because
    zero-score docs are out of contract here.

    Determinism: per-TERM scores round to 6dp BEFORE the sum, so both
    engines sum identical decimals and the (query, doc) aggregate is
    order-independent at the parity band (the exact trick behind the
    pinned per-term-additivity invariant — an unrounded float SUM would
    be partial-aggregation-order-dependent).
    """
    stats, doclen, postings = index
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
    )
    needed = qt.select("term").distinct()
    filt = postings.join(F.broadcast(needed), "term", "left_semi")
    dfs = filt.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    j = (
        qt.join(filt, "term")
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .join(doclen, id_col)
    )
    avgdl = F.round(F.col("total_dl") / F.col("n_docs"), 6)
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl") / F.greatest(avgdl, F.lit(1e-9))
    )
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            + 1.0
        ),
        6,
    )
    term_score = F.round(
        (idf * (F.col("tf") * F.lit(k1 + 1.0))) / (F.col("tf") + norm), 6
    )
    scores = (
        j.select("query_id", F.col(id_col), term_score.alias("__s"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("__s"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= int(top_k))
        .select("query_id", id_col, "bm25")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping token windows — the training
    -data prep step between curation and batching. Returns (id_col,
    chunk_id, n_tokens, chunk_text); tokenless docs emit no rows.

    Windows start at 0, stride, 2*stride, ... (stride = chunk_tokens -
    overlap) up to ``n - overlap - 1``, so coverage is contiguous, the
    final window always reaches the last token, and no window is fully
    contained in its predecessor. A doc shorter than one window yields
    exactly one (whole-doc) chunk.

    Entirely JVM-side: tokenize once, explode a ``sequence`` of window
    starts (map-side — no shuffle anywhere in this operator), ``slice``
    each window out of the shared token array. Chunk text is the
    token-joined form (single spaces), the normalized contract that
    makes chunks byte-identical across engines.
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    return (
        toks.withColumn(
            "__start",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.lit(0), F.col("__n") - overlap - 1),
                    F.lit(stride),
                )
            ),
        )
        .withColumn(
            "__chunk", F.slice("__toks", F.col("__start") + 1, chunk_tokens)
        )
        .filter(F.size("__chunk") > 0)
        .select(
            F.col(id_col),
            (F.col("__start") / stride).cast("int").alias("chunk_id"),
            F.size("__chunk").alias("n_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def quantile_threshold_filter(
    df: DataFrame,
    score_col: str,
    p: float = 0.5,
    exact: bool = True,
    threshold_col: str = "q_threshold",
) -> DataFrame:
    """Keep rows at or above the corpus-wide ``p``-quantile of
    ``score_col`` (the "top X% by quality" curation cut).

    The threshold is computed once over the whole corpus and broadcast —
    one aggregate plus a narrow filter, no per-row shuffle. ``exact=True``
    uses ``percentile`` (linear interpolation, matches DuckDB
    ``quantile_cont`` at 6dp — contract-checkable); at 100 TB switch to
    ``exact=False`` (``approx_percentile``, a GK/KLL-family rank
    sketch, single-pass
    mergeable sketch) — same plan shape, bounded memory.

    Threshold and comparison are rounded to 6dp so the kept set is
    identical across engines (raw float thresholds are unsafe — see
    CLAUDE.md oracle-parity kit).
    """
    fn = "percentile" if exact else "approx_percentile"
    thr = df.agg(
        F.round(F.expr(f"{fn}({score_col}, {p}d)"), 6).alias(threshold_col)
    )
    return df.crossJoin(F.broadcast(thr)).filter(
        F.round(F.col(score_col), 6) >= F.col(threshold_col)
    )


# Gopher/C4-style document-level rule battery. Each rule is a published
# heuristic (Rae et al. 2021 "Gopher" §A.2; Raffel et al. 2020 "C4"
# §2.2), restated over this corpus's tokenizer. The reference engine has
# no text-quality surface at all (its unit is the CSV row — SURVEY.md
# §1.1); this is part of the training-data extension surface.
GOPHER_BLOCKLIST: tuple[str, ...] = ("lorem ipsum", "javascript", "{")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_distinct_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style quality rule battery with per-rule verdict columns.

    Emits one boolean column per rule plus the conjunction ``keep`` —
    the per-rule flags are what a curation pipeline actually wants
    (rule-level pass rates drive threshold tuning; a bare keep/drop
    hides which rule fired). All signals are native column expressions
    (map-side, zero shuffles, whole-stage codegen); ratio columns are
    rounded to 6dp and every rule compares on the ROUNDED value so the
    kept set is bit-identical across engines (CLAUDE.md parity kit).

    Rules (document-level; the corpus has no newlines, so C4's
    line-level checks are out of scope — ``span_dedup`` /
    ``paragraph_dedup`` cover sub-document granularity):

    - ``rule_word_count``: ``min_words <= n_words <= max_words``
    - ``rule_mean_word_len``: mean word length in
      ``[min_mean_word_len, max_mean_word_len]``
    - ``rule_symbol_ratio``: (``#`` + ``...`` occurrences) / words
      ``<= max_symbol_word_ratio``
    - ``rule_alpha_words``: fraction of words containing a letter
      ``>= min_alpha_word_frac``
    - ``rule_stopwords``: at least ``min_distinct_stopwords`` distinct
      English stopwords occur
    - ``rule_blocklist``: none of ``GOPHER_BLOCKLIST`` occurs
      (case-insensitive substring)
    """
    c = F.coalesce(_c(text_col), F.lit(""))
    # materialize the token array once: Catalyst does not CSE across
    # nested higher-order functions (CLAUDE.md), so `w` gets its own
    # projection instead of being re-derived per rule.
    staged = df.withColumn("_gw", words(c))
    w = F.col("_gw")
    n_words = F.size(w)
    denom = F.greatest(n_words, F.lit(1))
    mean_wl = F.round(
        F.aggregate(w, F.lit(0.0), lambda a, x: a + F.length(x)) / denom, 6
    )
    n_symbols = _count_matches(c, r"#|\.\.\.")
    sym_ratio = F.round(n_symbols / denom, 6)
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / denom, 6
    )
    stop_arr = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop_distinct = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(w, s))
    )
    lowered = F.lower(c)
    blocked = None
    for phrase in GOPHER_BLOCKLIST:
        hit = lowered.contains(F.lit(phrase))
        blocked = hit if blocked is None else (blocked | hit)
    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "rule_symbol_ratio": sym_ratio <= max_symbol_word_ratio,
        "rule_alpha_words": alpha_frac >= min_alpha_word_frac,
        "rule_stopwords": n_stop_distinct >= min_distinct_stopwords,
        "rule_blocklist": ~blocked,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    out = staged.select(
        *[x for x in df.columns],
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop_distinct.alias("n_distinct_stopwords"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )
    return out


# C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2).
C4_TERMINAL_PUNCT: tuple[str, ...] = (".", "!", "?", '"')
C4_DOC_BLOCKLIST: tuple[str, ...] = ("lorem ipsum",)


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
    min_line_words: int = 3,
    terminal_punct: tuple[str, ...] = C4_TERMINAL_PUNCT,
    line_blockwords: tuple[str, ...] = ("javascript",),
    min_kept_lines: int = 5,
    min_kept_frac: float = 0.0,
    doc_blocklist: tuple[str, ...] = C4_DOC_BLOCKLIST,
    drop_brace_docs: bool = True,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) — the
    first stage of the most-cited published pipeline, absent from the
    doc-granular ``gopher_rules``. Splits the document on ``line_sep``,
    keeps a line iff it

    - ends (after right-trim) in one of ``terminal_punct`` (period,
      exclamation, question mark, end quote — the paper's set),
    - has at least ``min_line_words`` whitespace-separated words,
    - contains none of ``line_blockwords`` (paper: the word
      "javascript"),

    re-joins survivors with ``line_sep`` into ``text_clean``, and emits
    per-doc verdict columns in the ``gopher_rules`` style (flags, not a
    filter — rule-level pass rates drive threshold tuning):

    - ``n_lines`` / ``n_kept_lines`` / ``kept_frac`` (6dp-rounded),
    - ``rule_min_lines``: ``n_kept_lines >= min_kept_lines`` (paper:
      "discarded any page with fewer than 5 sentences", sentences
      approximated by kept lines),
    - ``rule_kept_frac``: ``kept_frac >= min_kept_frac`` (the "lost
      too much" guard; default 0.0 = off),
    - ``rule_no_blockdoc``: no ``doc_blocklist`` phrase in the ORIGINAL
      text (paper: "lorem ipsum"), case-insensitive,
    - ``rule_no_brace``: no curly bracket in the original text (paper:
      code marker; ``drop_brace_docs=False`` forces it true),
    - ``keep``: the conjunction.

    Pure map-side projection (split → higher-order filter → re-join,
    whole-stage codegen, zero shuffles) so it composes with scan
    pushdown and runs at 100 TB as a free pass over the corpus. NULL
    text behaves as empty (one empty line, nothing kept). The kept-frac
    ratio is rounded to 6dp and compared on the rounded value
    (CLAUDE.md parity kit) so the kept set is engine-exact.

    Reference scope note: the reference engine is row/CSV-granular
    (SURVEY.md §1.1) — this belongs to the training-data extension
    surface next to ``gopher_rules`` / ``span_dedup``.
    """
    if int(min_line_words) < 0 or int(min_kept_lines) < 0:
        raise ValueError("c4_line_filter: thresholds must be >= 0")
    c = F.coalesce(_c(text_col), F.lit(""))
    punct = [F.lit(p) for p in terminal_punct]

    def _line_keep(x: Column) -> Column:
        trimmed = F.rtrim(x)
        last = trimmed.substr(F.length(trimmed), F.lit(1))
        n_words = F.size(F.filter(F.split(x, " "), lambda w: w != F.lit("")))
        keep = last.isin(*punct) & (n_words >= int(min_line_words))
        low = F.lower(x)
        for word in line_blockwords:
            keep = keep & ~low.contains(F.lit(word))
        return keep

    # materialize the split array, then the filtered array, each in its
    # own projection: Catalyst does not CSE across nested higher-order
    # functions (CLAUDE.md), and n_kept/text_clean/kept_frac all read
    # the filtered array.
    staged = df.withColumn("_c4l", F.split(c, line_sep, -1)).withColumn(
        "_c4k", F.filter(F.col("_c4l"), _line_keep)
    )
    n_lines = F.size(F.col("_c4l"))
    n_kept = F.size(F.col("_c4k"))
    kept_frac = F.round(n_kept / F.greatest(n_lines, F.lit(1)), 6)
    low_doc = F.lower(c)
    no_blockdoc = F.lit(True)
    for phrase in doc_blocklist:
        no_blockdoc = no_blockdoc & ~low_doc.contains(F.lit(phrase))
    no_brace = (
        ~c.contains(F.lit("{")) & ~c.contains(F.lit("}"))
        if drop_brace_docs
        else F.lit(True)
    )
    rules = {
        "rule_min_lines": n_kept >= int(min_kept_lines),
        "rule_kept_frac": kept_frac >= float(min_kept_frac),
        "rule_no_blockdoc": no_blockdoc,
        "rule_no_brace": no_brace,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return staged.select(
        *[x for x in df.columns],
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        kept_frac.alias("kept_frac"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
        F.array_join(F.col("_c4k"), line_sep).alias("text_clean"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.5,
    min_count: int = 1,
) -> DataFrame:
    """Bigram-LM quality signal: each doc's mean log-probability of its
    word bigrams under the corpus's OWN bigram model with Jelinek-Mercer
    interpolation — ``P(w2|w1) = lam * c(w1 w2)/c(w1) +
    (1-lam) * c(w2)/N``. The unigram backoff term keeps every observed
    bigram's probability positive, so no discounting bookkeeping is
    needed; this is the standard step up from :func:`unigram_logprob`
    when gibberish has plausible tokens in implausible order.

    Returns ``(id_col, n_bigrams, mean_logprob)`` rounded to 6dp; docs
    with fewer than two words emit no row (same contract as the unigram
    scorer's no-token case).

    Scale shape: bigram construction is map-side (materialized token
    array — nested-HOF CSE rule); the bigram and unigram count tables
    shuffle at |bigram-vocab| / |vocab| size after map-side partial
    aggregation; the probe stream joins each count table keyed on its
    gram and the corpus total broadcasts as a scalar. No Python, no
    driver collect. The static plan re-scans the input for each count
    table (5 pruned scans — see PLANS.md); at corpus scale, write the
    tokenized stream once and feed it here (the count tables and probe
    then share one materialized input), or rely on AQE exchange reuse
    where the lineages coincide. The alternative — window counts over
    the full token stream — trades the scans for two |tokens|-sized
    sort shuffles, which is worse once the corpus outgrows memory.

    ``min_count`` is the 100 TB lever (the 16× sweep's worst ratio was
    this operator's |bigram-vocab|-sized table): bigram types seen
    fewer than ``min_count`` times are PRUNED from the count table and
    score through the unigram backoff alone (``P = (1-lam)·c(w2)/N``,
    exactly the Jelinek-Mercer treatment of an unseen bigram). Natural
    bigram vocabularies are long-tail-dominated — hapax bigrams are
    typically >½ of all types — so ``min_count=2`` roughly halves the
    model table, the downstream probe join's build side, and the count
    table's shuffle write, while the probe stream itself is untouched.
    ``min_count=1`` keeps every observed bigram and reproduces the
    unpruned scores bit-for-bit (the LEFT join below coalesces a count
    that is never NULL), so the original oracle stays exact.
    """
    if not 0.0 < lam <= 1.0:
        raise ValueError("lam must be in (0, 1]")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    staged = ensure_parallelism(df).withColumn(
        "_bl_toks", words(F.coalesce(_c(text_col), F.lit("")))
    )
    tok = staged.select(
        F.col(id_col), F.explode(F.col("_bl_toks")).alias("__tok")
    )
    vocab = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__n")).alias("v")
    total = vocab.agg(F.sum("__n").cast("double").alias("__N")).alias("tt")
    big = staged.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col("_bl_toks"), 2)).alias("__bg"),
    ).alias("g")
    bcnt = big.groupBy("__bg").agg(F.count(F.lit(1)).alias("__nb"))
    if min_count > 1:
        bcnt = bcnt.filter(F.col("__nb") >= int(min_count))
    bcnt = bcnt.alias("b")
    v1 = vocab.select(
        F.col("__tok").alias("__w1"), F.col("__n").alias("__n1")
    ).alias("v1")
    v2 = vocab.select(
        F.col("__tok").alias("__w2"), F.col("__n").alias("__n2")
    ).alias("v2")
    scored = (
        big.join(bcnt, F.col("g.__bg") == F.col("b.__bg"), "left")
        .join(v1, F.split(F.col("g.__bg"), " ")[0] == F.col("v1.__w1"))
        .join(v2, F.split(F.col("g.__bg"), " ")[1] == F.col("v2.__w2"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col(f"g.{id_col}").alias(id_col),
            F.log(
                F.lit(lam)
                * F.coalesce(F.col("b.__nb"), F.lit(0))
                / F.col("v1.__n1")
                + F.lit(1.0 - lam) * F.col("v2.__n2") / F.col("tt.__N")
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
    )


def kn_bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    interpolated form per Chen & Goodman 1998 §2.7) — the published
    standard the Jelinek-Mercer :func:`bigram_logprob` steps up to:

        P(w2|w1) = max(c(w1 w2) - d, 0) / c(w1 ·)
                   + d · N1+(w1 ·)/c(w1 ·) · N1+(· w2)/B

    where ``c(w1 ·)`` is w1's bigram-context count, ``N1+(w1 ·)`` its
    distinct-successor fanout, ``N1+(· w2)`` the CONTINUATION count
    (distinct predecessors — the KN insight: 'francisco' is frequent
    but follows only 'san', so its continuation probability is tiny),
    and ``B`` the number of distinct bigram types. All four model
    tables derive from ONE bigram-type aggregate; with the model fit on
    the scored corpus itself every probe bigram is observed, so the
    max() term is always positive and the score is well-defined.

    Returns ``(id_col, n_bigrams, mean_logprob)`` — the per-doc mean ln
    P of its bigram stream, rounded 6dp LAST (sums of doubles agree far
    below 1e-6; CLAUDE.md float-oracle contract). Docs with fewer than
    two words emit no row.

    Scale shape: bigram pairs are map-side off the materialized token
    array; the type table and its three marginals shuffle at
    |bigram-vocab| size with map-side partial aggregation; the probe
    stream joins each keyed on its gram and ``B`` broadcasts as a
    scalar. No Python, no collect. Same static re-scan note as
    :func:`bigram_logprob` (materialize the tokenized stream once at
    corpus scale)."""
    if not 0.0 < float(discount) < 1.0:
        raise ValueError("discount must be in (0, 1)")
    d = float(discount)
    staged = ensure_parallelism(df).withColumn(
        "_kn_toks", words(F.coalesce(_c(text_col), F.lit("")))
    )
    toks = F.col("_kn_toks")
    pairs = staged.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("_p"),
    ).select(F.col(id_col), F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    bt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__nb"))
    ctx = bt.groupBy("w1").agg(
        F.sum("__nb").alias("__c1"),
        F.count(F.lit(1)).alias("__f1"),
    ).alias("ctx")
    cont = bt.groupBy("w2").agg(F.count(F.lit(1)).alias("__r2")).alias("ct")
    btypes = bt.agg(F.count(F.lit(1)).cast("double").alias("__B")).alias("bb")
    g = pairs.alias("g")
    scored = (
        g.join(bt.alias("b"), ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btypes))
        .select(
            F.col(f"g.{id_col}").alias(id_col),
            F.log(
                F.greatest(F.col("b.__nb") - F.lit(d), F.lit(0.0))
                / F.col("ctx.__c1")
                + F.lit(d)
                * F.col("ctx.__f1")
                / F.col("ctx.__c1")
                * F.col("ct.__r2")
                / F.col("bb.__B")
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("mean_logprob"),
    )


def hashed_tf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    dense: bool = False,
    seed: str = "tf|",
) -> DataFrame:
    """Hashing-trick term-frequency features (Weinberger et al. 2009,
    arXiv:0902.2206): token → ``md5 % dim`` bucket, count per (doc,
    bucket). No vocabulary pass, no model, fixed memory per doc — the
    zero-dependency featurizer that lets the embedding-side operators
    (``similarity.semantic_dedup``, k-means, ANN) run on raw text.

    ``dense=False`` (default) returns the long form ``(id_col, bucket,
    tf)`` — one |tokens|-keyed shuffle, exactly SQL-reproducible (the
    md5 recipe matches ``dedup.hash60``, re-stated here because text
    must not import dedup).
    ``dense=True`` additionally assembles the ``dim``-length double
    array (map_from_entries + transform over the index range, JVM-side)
    as ``tf_vec`` — the drop-in ``embedding`` column shape.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    tok = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(words(F.coalesce(_c(text_col), F.lit("")))).alias("__tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), F.col("__tok"))), 1, 15), 16, 10)
        .cast("bigint") % F.lit(dim)
    )
    long_form = (
        tok.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if not dense:
        return long_form
    as_map = long_form.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "tf"))
        ).alias("__m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("bigint")), F.lit(0)
        ).cast("double"),
    )
    return as_map.select(F.col(id_col), vec.alias("tf_vec"))


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = True,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partition (Wenzek et al. 2020,
    arXiv:1911.00359 §3.3): score every doc under the corpus's own LM
    (here the self-unigram proxy from :func:`unigram_logprob`), cut the
    score distribution at the ``q`` quantiles, and label each doc
    ``head`` (most fluent third), ``middle``, or ``tail``. CCNet keeps
    head+middle for pretraining and uses tail as the discard/inspect set.

    Scale shape: scoring is the unigram_logprob plan (vocab-sized
    shuffles); the two thresholds are ONE corpus-wide aggregate
    broadcast back — no per-row shuffle, no sort of the full corpus.
    ``exact=True`` uses ``percentile`` (matches DuckDB ``quantile_cont``
    at 6dp — contract-checkable); at 100 TB flip to ``exact=False``
    (``approx_percentile``, a mergeable GK/KLL-family rank sketch,
    same plan shape).
    Thresholds and comparisons are on 6dp-rounded scores (parity kit),
    so the partition is identical across engines.
    """
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col)
    fn = "percentile" if exact else "approx_percentile"
    thr = scored.agg(
        F.round(F.expr(f"{fn}(mean_logprob, {q[0]!r}d)"), 6).alias("__t_lo"),
        F.round(F.expr(f"{fn}(mean_logprob, {q[1]!r}d)"), 6).alias("__t_hi"),
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("mean_logprob"),
            F.when(F.col("mean_logprob") >= F.col("__t_hi"), F.lit("head"))
            .when(F.col("mean_logprob") >= F.col("__t_lo"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )


def _dsir_features(
    df: DataFrame, text_col: str, id_col: str, dim: int, seed: str = "dsir|"
) -> DataFrame:
    """Hashed bag-of-ngrams (unigrams + word bigrams → md5 % dim), long
    form ``(id, bucket, cnt)``. The md5 recipe is the oracle-parity hash;
    the explode is map-side and the count shuffles at most
    |docs|·min(len, dim) rows after partial aggregation."""
    toks = words(F.coalesce(_c(text_col), F.lit("")))
    grams = F.concat(toks, _word_ngrams(toks, 2))
    g = ensure_parallelism(df).select(
        F.col(id_col), F.explode(grams).alias("__g")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), F.col("__g"))), 1, 15), 16, 10)
        .cast("bigint") % F.lit(dim)
    )
    return (
        g.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    rank ``raw`` documents by their importance log-weight under hashed
    n-gram unigram models of the ``target`` vs the ``raw`` corpus —
    ``log w(x) = Σ_b cnt_x(b) · (ln p̂_target(b) − ln p̂_raw(b))`` with
    add-``alpha`` smoothing — and keep the top ``k`` most target-like.
    (The paper samples ∝ w; the deterministic top-k is the
    contract-checkable variant — swap the cut for a seeded Gumbel draw
    to recover sampling.)

    Scale shape: both corpora reduce to a ≤ ``dim``-row bucket table
    (vocab-sized shuffle with map-side combine), the log-ratio table
    broadcasts back onto the raw docs' features (no shuffle of the
    corpus), the per-doc weight is one keyed aggregation, and the top-k
    is Spark's TakeOrdered (per-partition heaps, no global sort
    materialization). Weights rounded 6dp; the cut breaks ties on
    ``id_col`` — deterministic across engines.
    """
    if k < 1 or dim < 1:
        raise ValueError("k and dim must be >= 1")
    # r14 (guide §1.2; the r13 small-artifact eager-checkpoint rule):
    # rf feeds BOTH the per-bucket marginal chain (rawc → nr_tot →
    # ratio) and the scoring join (weights), and tf_ feeds tgt which is
    # read by ratio AND nt_tot — left lazy, the heavy ngram explode +
    # md5 hashing re-ran 3× for raw and 2× for target (6 parquet scans
    # / 44 Exchanges in the before plan). rf is the doc×bucket
    # aggregate (≤ |docs|·dim rows, far smaller than the token stream)
    # and tgt is ≤ dim rows — both are the "small shared artifact, many
    # consumers" shape the r13 probes proved wins.
    rf = _dsir_features(raw, text_col, id_col, dim).localCheckpoint(eager=True)
    tf_ = _dsir_features(target, text_col, id_col, dim)
    # totals derive from the same aggregates they cross-join back onto —
    # qualify every reference or Spark flags the lineage ambiguous (the
    # unigram_logprob pattern)
    tgt = (
        tf_.groupBy("bucket")
        .agg(F.sum("cnt").alias("__nt"))
        .localCheckpoint(eager=True)
        .alias("tg")
    )
    rawc = rf.groupBy("bucket").agg(F.sum("cnt").alias("__nr")).alias("rw")
    nt_tot = tgt.agg(F.sum("__nt").cast("double").alias("__NT")).alias("tt")
    nr_tot = rawc.agg(F.sum("__nr").cast("double").alias("__NR")).alias("rt")
    ratio = (
        rawc.join(tgt, F.col("rw.bucket") == F.col("tg.bucket"), "left")
        .crossJoin(F.broadcast(nt_tot))
        .crossJoin(F.broadcast(nr_tot))
        .select(
            F.col("rw.bucket").alias("bucket"),
            (
                F.log(
                    (F.coalesce(F.col("tg.__nt"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tt.__NT") + F.lit(alpha * dim))
                )
                - F.log(
                    (F.col("rw.__nr") + F.lit(alpha))
                    / (F.col("rt.__NR") + F.lit(alpha * dim))
                )
            ).alias("__lr"),
        )
    )
    weights = (
        rf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("cnt") * F.col("__lr")), 6).alias("dsir_logw"))
    )
    return (
        raw.join(weights, id_col)
        .orderBy(F.col("dsir_logw").desc(), F.col(id_col))
        .limit(k)
    )


def repeated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    k: int = 50,
) -> DataFrame:
    """Cross-document repeated-passage mining: the ``k`` word
    ``n``-grams appearing in the most DISTINCT documents (≥
    ``min_docs``), with document and occurrence counts — the diagnostic
    that surfaces boilerplate (headers, licenses, navigation chrome)
    before span-level dedup is tuned.

    One keyed shuffle on the gram with map-side partial aggregation
    (shuffled volume is |distinct grams|, not |token stream|); the cut
    is a deterministic total order (n_docs desc, n_occurrences desc,
    gram asc) through TakeOrdered — no global sort materialization.
    """
    if n < 1 or k < 1 or min_docs < 1:
        raise ValueError("n, k and min_docs must be >= 1")
    toks = words(F.coalesce(_c(text_col), F.lit("")))
    grams = ensure_parallelism(df).select(
        F.col(id_col), F.explode(_word_ngrams(toks, n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return (
        counts.filter(F.col("n_docs") >= min_docs)
        .orderBy(
            F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("gram")
        )
        .limit(k)
    )


def _runlen_sum_clogc(sorted_g: Column) -> Column:
    """Σ c·ln(c) over the run lengths of a SORTED list (0.0 for empty)
    — the sufficient statistic for Shannon entropy, in the same single
    O(L) run-length ``aggregate`` shape as :func:`_max_run_count`
    (sort + scan, never count-distinct-via-filter: that is O(L²) per
    document and melts on long docs)."""
    step = lambda acc, x: F.struct(  # noqa: E731 — struct-state fold
        x.alias("prev"),
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
        .otherwise(F.lit(1))
        .alias("run"),
        (
            acc["s"]
            + F.when(
                acc["prev"].isNotNull() & ~x.eqNullSafe(acc["prev"]),
                acc["run"].cast("double") * F.log(acc["run"].cast("double")),
            ).otherwise(F.lit(0.0))
        ).alias("s"),
    )
    return F.aggregate(
        sorted_g,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("s"),
        ),
        step,
        lambda acc: acc["s"]
        + F.when(
            acc["prev"].isNotNull(),
            acc["run"].cast("double") * F.log(acc["run"].cast("double")),
        ).otherwise(F.lit(0.0)),
    )


def _entropy_bits(sorted_g: Column) -> Column:
    """Shannon entropy in BITS of a SORTED element list:
    H = (ln n − Σ c·ln c / n) / ln 2, 6dp-rounded (the float-parity
    contract: both engines round the FINAL value; sums of a few hundred
    doubles agree far below 1e-6). Empty and single-element lists are
    0.0 by the same formula."""
    n = F.size(sorted_g).cast("double")
    s = _runlen_sum_clogc(sorted_g)
    return F.round(
        F.when(
            n > 0, (F.log(n) - s / n) / F.lit(float(__import__("math").log(2)))
        ).otherwise(F.lit(0.0)),
        6,
    )


def entropy_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy quality signals: ``char_entropy``
    (bits/char over the lowercased, whitespace-stripped characters) and
    ``word_entropy`` (bits/word over WORD_REGEX tokens), plus the
    element counts. Low character entropy marks symbol-looped or
    single-character boilerplate; low word entropy marks repeated-word
    spam — the entropy members of the quality-filter stack next to
    repetition_stats' n-gram fractions and gopher_rules' thresholds.

    Map-side only (0 shuffles): per doc, sort the element list once and
    fold run lengths in one O(L log L) pass; NULL text behaves as empty
    (both entropies 0.0, matching the SQL oracle)."""
    chars = F.filter(
        F.split(
            F.regexp_replace(
                F.lower(F.coalesce(_c(text_col), F.lit(""))), r"\s", ""
            ),
            "",
        ),
        lambda x: x != "",
    )
    staged = df.select(
        F.col(id_col),
        F.array_sort(chars).alias("__cs"),
        F.array_sort(words(F.coalesce(_c(text_col), F.lit("")))).alias(
            "__ws"
        ),
    )
    return staged.select(
        F.col(id_col),
        F.size("__cs").cast("bigint").alias("n_chars_nospace"),
        F.size("__ws").cast("bigint").alias("n_words"),
        _entropy_bits(F.col("__cs")).alias("char_entropy"),
        _entropy_bits(F.col("__ws")).alias("word_entropy"),
    )


def tokenizer_fertility_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer fertility / compression census per source — the numbers
    a tokenizer choice is actually made on (tokens-per-word "fertility",
    Ács 2019 usage; bytes-per-token compression): per group, doc count,
    total bytes / chars / regex tokens (``TOKEN_REGEX``, the BPE-ish
    word+punct splitter) / word tokens (``WORD_REGEX``), plus
    ``tokens_per_word`` and ``bytes_per_token`` at 6dp. A fertility
    drift between sources (or between crawls of one source) is the
    early warning that a trained tokenizer will segment the new data
    badly — sequence lengths and effective context shrink.

    Scale: one map-side projection of per-doc counters + one group-keyed
    partial aggregate — group cardinality rows out, never the corpus.
    NULL text counts as empty everywhere (the repo-wide convention);
    ratios are NULL (not a division error) for a group with zero
    words/tokens.
    """
    c = F.coalesce(_c(text_col), F.lit(""))
    per = df.select(
        F.col(group_col).alias("source"),
        F.octet_length(c).alias("__b"),
        F.length(c).alias("__c"),
        token_count(c).alias("__t"),
        F.size(words(c)).alias("__w"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__b").alias("total_bytes"),
        F.sum("__c").alias("total_chars"),
        F.sum("__t").alias("total_tokens"),
        F.sum("__w").alias("total_words"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_bytes",
        "total_chars",
        "total_tokens",
        "total_words",
        F.when(
            F.col("total_words") > 0,
            F.round(F.col("total_tokens") / F.col("total_words"), 6),
        ).alias("tokens_per_word"),
        F.when(
            F.col("total_tokens") > 0,
            F.round(F.col("total_bytes") / F.col("total_tokens"), 6),
        ).alias("bytes_per_token"),
    )


PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # simple character-class+quantifier shapes only: Java regex and RE2
    # agree on these (no lookaround/backrefs — RE2 has neither)
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)


def pii_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """PII-exposure census per source — the compliance view BEFORE
    :func:`scrub_text` masks anything (which docs would be touched, how
    many matches, which source leaks what): one long-form row per
    (group, pii_type) with ``n_docs`` (group size), ``n_docs_hit``
    (docs with ≥1 match) and ``n_matches`` (total matches).

    One map-side projection counting every pattern per doc, one
    group-keyed partial aggregate, then a k-patterns-sized explode of
    the aggregate row — group-cardinality × n_patterns rows out, the
    corpus never shuffled on content. NULL text counts as empty. The
    pattern shapes are restricted to character classes + quantifiers so
    the Java-regex (Spark) and RE2 (DuckDB oracle) match sets are
    identical.
    """
    c = F.coalesce(_c(text_col), F.lit(""))
    per = df.select(
        F.col(group_col).alias("source"),
        *[
            _count_matches(c, pat).alias(f"__c_{name}")
            for name, pat in patterns
        ],
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    for name, _ in patterns:
        aggs.append(
            F.sum((F.col(f"__c_{name}") > 0).cast("bigint")).alias(f"__d_{name}")
        )
        aggs.append(F.sum(f"__c_{name}").cast("bigint").alias(f"__m_{name}"))
    agg = per.groupBy("source").agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("pii_type"),
                F.col(f"__d_{name}").alias("n_docs_hit"),
                F.col(f"__m_{name}").alias("n_matches"),
            )
            for name, _ in patterns
        ]
    )
    return agg.select(
        "source", "n_docs", F.explode(rows).alias("__r")
    ).select(
        "source",
        "n_docs",
        F.col("__r.pii_type").alias("pii_type"),
        F.col("__r.n_docs_hit").alias("n_docs_hit"),
        F.col("__r.n_matches").alias("n_matches"),
    )


def merge_fertility_reports(*reports: DataFrame) -> DataFrame:
    """Incremental maintenance for :func:`tokenizer_fertility_report`:
    the census is an ALGEBRAIC aggregate (every ratio derives from
    summed integer counters), so the census of a grown corpus is the
    counter-sum of per-part censuses with the ratios recomputed — the
    ``extend_*`` pattern applied to corpus statistics. At 100 TB the
    per-crawl census is computed once on the delta and merged; the
    corpus is never rescanned. merge(census(A), census(B)) ≡
    census(A ∪ B) exactly (identical integer sums → identical rounded
    divisions; identity-contract query shares the direct oracle
    verbatim)."""
    if not reports:
        raise ValueError("merge_fertility_reports: no reports")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    agg = out.groupBy("source").agg(
        *[
            F.sum(c).cast("bigint").alias(c)
            for c in (
                "n_docs",
                "total_bytes",
                "total_chars",
                "total_tokens",
                "total_words",
            )
        ]
    )
    return agg.select(
        "source",
        "n_docs",
        "total_bytes",
        "total_chars",
        "total_tokens",
        "total_words",
        F.when(
            F.col("total_words") > 0,
            F.round(F.col("total_tokens") / F.col("total_words"), 6),
        ).alias("tokens_per_word"),
        F.when(
            F.col("total_tokens") > 0,
            F.round(F.col("total_bytes") / F.col("total_tokens"), 6),
        ).alias("bytes_per_token"),
    )


def merge_pii_reports(*reports: DataFrame) -> DataFrame:
    """Incremental maintenance for :func:`pii_report` — same algebraic
    contract as :func:`merge_fertility_reports`: all three columns are
    integer counters, so per-part censuses sum per (source, pii_type)
    into exactly the direct census of the union."""
    if not reports:
        raise ValueError("merge_pii_reports: no reports")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.groupBy("source", "pii_type").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_docs_hit").cast("bigint").alias("n_docs_hit"),
        F.sum("n_matches").cast("bigint").alias("n_matches"),
    ).select("source", "n_docs", "pii_type", "n_docs_hit", "n_matches")


def zipf_fit_report(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Zipf's-law fit over the corpus head vocabulary — the
    is-this-natural-language corpus diagnostic (natural text shows
    ln(freq) ≈ a − s·ln(rank) with s near 1; boilerplate, spam and
    generated gibberish bend it): OLS of ln(count) on ln(rank) over the
    ``top_k`` most frequent terms, one row out
    ``(n_terms, slope, intercept, r2)`` at 6dp.

    The vocab count is the :func:`top_terms` shuffle (|vocabulary|
    volume, map-side partial counts); the fit runs on the k-row cut in
    closed form from the raw moment sums (slope, intercept and r²
    each a single rounded expression — no iterative fit, and per the
    float-sum contract only the FINAL values round)."""
    counts = top_terms(df, text_col, k=top_k)
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    xy = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("__x"),
        F.log(F.col("n").cast("double")).alias("__y"),
    )
    a = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("n_terms").cast("double")
    det = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return a.select(
        "n_terms",
        F.round(cov / det, 6).alias("slope"),
        F.round(
            (F.col("__sy") * F.col("__sxx") - F.col("__sx") * F.col("__sxy"))
            / det,
            6,
        ).alias("intercept"),
        F.round((cov * cov) / (det * vary), 6).alias("r2"),
    )


def source_vocab_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 100,
) -> DataFrame:
    """Per-source vocabulary divergence — the mixing diagnostic behind
    temperature/proportion choices (how far each source's word usage
    sits from the corpus average): add-one-smoothed KL(P_source ‖
    P_corpus) over the corpus's ``top_k`` head vocabulary, one row per
    source ``(source, n_vocab_tokens, kl)`` with kl at 6dp.

    P_corpus is the head-vocab frequency; P_source is add-one smoothed
    over the same V terms (so zero-count terms contribute — the grid is
    sources × V, built from a broadcast vocab). Scale: the vocab count
    is the |vocabulary|-volume shuffle; the per-(source, term) count
    only shuffles vocab-restricted tokens; everything after is
    sources × V rows. Only the final KL sum rounds (the float-sum
    contract)."""
    toks = df.select(
        F.col(group_col).alias("source"),
        F.explode(words(text_col)).alias("term"),
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(top_k)
    )
    n_corpus = vocab.agg(
        F.sum("n").cast("bigint").alias("__nc"),
        # actual head-vocab size: == top_k normally, smaller on a tiny
        # corpus — the add-one denominator must use the REAL V
        F.count(F.lit(1)).cast("bigint").alias("__nv"),
    )
    st = (
        toks.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    grid = (
        df.select(F.col(group_col).alias("source"))
        .distinct()
        .crossJoin(F.broadcast(vocab))
    )
    # st and cs are ≤ sources×V and ≤ sources rows by construction —
    # broadcast both so the S×V grid never shuffles
    g2 = grid.join(F.broadcast(st), ["source", "term"], "left").withColumn(
        "__c", F.coalesce(F.col("__c"), F.lit(0).cast("bigint"))
    )
    cs = g2.groupBy("source").agg(F.sum("__c").cast("bigint").alias("__cs"))
    joined = g2.join(F.broadcast(cs), "source").crossJoin(F.broadcast(n_corpus))
    ps = (F.col("__c") + F.lit(1)) / (F.col("__cs") + F.col("__nv"))
    pc = F.col("n") / F.col("__nc")
    return (
        joined.withColumn("__kl_term", ps * F.log(ps / pc))
        .groupBy("source", "__cs")
        .agg(F.round(F.sum("__kl_term"), 6).alias("kl"))
        .select(
            "source", F.col("__cs").alias("n_vocab_tokens"), "kl"
        )
    )


def perplexity_buckets_grouped(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    q: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = True,
) -> DataFrame:
    """:func:`perplexity_buckets` with PER-GROUP cut points — the form
    CCNet actually ships (Wenzek et al. 2020 §3.3 computes its
    head/middle/tail thresholds per language): scores stay corpus-wide
    (the same self-unigram LM — only the CUTS adapt), but each group is
    partitioned at its OWN score quantiles, so a uniformly-noisier
    source still yields a head third instead of landing wholesale in
    the global tail — the adaptive-threshold shape a mixed-quality
    crawl needs.

    Scale: scoring is the unigram_logprob plan; the thresholds are ONE
    group-keyed aggregate (|groups| rows, broadcast back); still no
    corpus sort. ``exact=False`` flips to approx_percentile at 100 TB
    (same plan shape). All comparisons on 6dp-rounded scores.

    Returns ``(id_col, group_col, n_tokens, mean_logprob, ppl_bucket)``.
    """
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col).join(
        df.select(id_col, group_col), id_col
    )
    fn = "percentile" if exact else "approx_percentile"
    thr = scored.groupBy(group_col).agg(
        F.round(F.expr(f"{fn}(mean_logprob, {q[0]!r}d)"), 6).alias("__t_lo"),
        F.round(F.expr(f"{fn}(mean_logprob, {q[1]!r}d)"), 6).alias("__t_hi"),
    )
    return (
        scored.join(F.broadcast(thr), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("n_tokens"),
            F.col("mean_logprob"),
            F.when(F.col("mean_logprob") >= F.col("__t_hi"), F.lit("head"))
            .when(F.col("mean_logprob") >= F.col("__t_lo"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )


def datasheet_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """One-row dataset datasheet — the quantitative slice of
    "Datasheets for Datasets" (Gebru et al., CACM 2021 §composition),
    the summary a corpus release ships: size (docs / sources / words),
    exact-duplicate fraction, dominant predicted language and its
    share, mean quality score, PII-bearing doc fraction, mean doc
    length. Every field reuses an already-oracle-proven signal
    (fingerprint dedup, stopword-vote language ID, the composite
    quality score, the PII email shape).

    One staged per-doc projection + one global aggregate + one
    language-mode aggregate (top language by count, ties by code) —
    nothing corpus-quadratic; per the float contract only final
    ratios round. NULL text counts as empty everywhere.
    """
    c = F.coalesce(_c(text_col), F.lit(""))
    per = df.select(
        F.col(id_col),
        F.col(group_col).alias("__src"),
        F.md5(
            F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
        ).alias("__fp"),
        F.size(words(c)).cast("bigint").alias("__w"),
        _count_matches(c, PII_PATTERNS[0][1]).alias("__em"),
    )
    lang = language_id(df.select(id_col, text_col), text_col).select(
        id_col, "lang_pred"
    )
    qual = quality_score(df.select(id_col, text_col), text_col).select(
        id_col, "quality_score"
    )
    j = per.join(lang, id_col).join(qual, id_col)
    base = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("__src").cast("bigint").alias("n_sources"),
        F.sum("__w").cast("bigint").alias("total_words"),
        F.countDistinct("__fp").cast("bigint").alias("__uniq"),
        F.round(F.avg("quality_score"), 6).alias("mean_quality"),
        F.sum((F.col("__em") > 0).cast("bigint")).alias("__pii_docs"),
    )
    top_lang = (
        j.groupBy("lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__lc"))
        .orderBy(F.col("__lc").desc(), F.col("lang_pred").asc())
        .limit(1)
    )
    return (
        base.crossJoin(F.broadcast(top_lang))
        .select(
            "n_docs",
            "n_sources",
            "total_words",
            F.round(
                (F.col("n_docs") - F.col("__uniq")) / F.col("n_docs"), 6
            ).alias("dup_doc_frac"),
            F.col("lang_pred").alias("top_lang"),
            F.round(F.col("__lc") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
            "mean_quality",
            F.round(F.col("__pii_docs") / F.col("n_docs"), 6).alias(
                "pii_docs_frac"
            ),
            F.round(F.col("total_words") / F.col("n_docs"), 6).alias(
                "mean_doc_words"
            ),
        )
    )


def readability_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per doc (Flesch 1948; the readability signal
    classic curation stacks keep next to the Gopher battery):
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`` with
    regex-only proxies both engines share exactly — sentences = runs of
    ``[.!?]+`` (min 1), syllables = vowel GROUPS per word (the standard
    cheap approximation; min 1 per word via max(groups, words)), words
    = WORD_REGEX tokens. Map-side projection, zero shuffles; the score
    rounds once at 6dp (the float contract). Empty/NULL docs score
    NULL rather than dividing by zero.

    Returns ``(id_col, n_words, n_sentences, n_syllables, flesch)``.
    """
    c = F.coalesce(_c(text_col), F.lit(""))
    n_words = F.size(words(c))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    # vowel groups across the lowercased text approximate syllables;
    # every word has >= 1 syllable, so take the max with the word count
    n_syl = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(c), F.lit(r"[aeiouy]+"), 0)
        ),
        n_words,
    )
    flesch = F.when(
        n_words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
            - F.lit(84.6) * (n_syl.cast("double") / n_words.cast("double")),
            6,
        ),
    )
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syl.cast("bigint").alias("n_syllables"),
        flesch.alias("flesch"),
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INTRA-document line dedup: keep the first occurrence of every
    distinct line within a doc and drop the repeats — the self-
    repetition REMOVAL sibling of ``repetition_stats`` (which only
    measures) and the within-doc complement of the cross-doc
    ``span_dedup``: scraped pages repeat nav bars, cookie banners and
    footers INSIDE one document, and n-gram statistics computed over
    them are inflated before any cross-doc signal runs. Emits
    ``(id, n_lines, n_kept, text_dedup)`` with survivors re-joined in
    original order. NULL text behaves as empty (one empty line — kept;
    the family convention).

    Scale: one (id, line) keyed aggregate (min position) + one id-keyed
    reassembly — dominance never crosses docs, both shuffles are
    doc-keyed and AQE-splittable; nothing corpus-quadratic.
    """
    lines = df.select(
        F.col(id_col),
        F.split(F.coalesce(_c(text_col), F.lit("")), "\n").alias("__l"),
    )
    ex = lines.select(
        id_col,
        F.size("__l").cast("bigint").alias("n_lines"),
        F.posexplode("__l"),
    ).select(
        id_col, "n_lines", F.col("pos").alias("__i"), F.col("col").alias("__line")
    )
    firsts = ex.groupBy(id_col, "__line").agg(
        F.min("__i").alias("__mi"), F.first("n_lines").alias("n_lines")
    )
    return (
        firsts.groupBy(id_col)
        .agg(
            F.first("n_lines").alias("n_lines"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__mi"), F.col("__line")))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("text_dedup"),
        )
        .select(id_col, "n_lines", "n_kept", "text_dedup")
    )


def vocab_coverage_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus's own top-k
    vocabulary (count desc, word asc ties) — the coverage signal behind
    tokenizer sizing and domain-shift triage (a doc whose words the
    head vocabulary barely covers is jargon, another language, or
    noise; ``tokenizer_fertility_report`` measures sequence LENGTH,
    this measures vocabulary FIT). Emits ``(id, n_tokens, n_oov,
    oov_rate)``; zero-token docs keep NULL oov_rate (no ANSI division
    error), 6dp final round only.

    Scale: the vocabulary is a vocab-volume keyed count cut to k with
    TakeOrdered (no global window — the key_skew_report lesson) and
    broadcast; the token stream joins it map-side, one doc-keyed count
    back. Nothing corpus-quadratic, no Python.
    """
    if vocab_size < 1:
        raise ValueError("vocab_coverage_report: vocab_size must be >= 1")
    txt = F.coalesce(_c(text_col), F.lit(""))
    toks = df.select(F.col(id_col), F.explode(words(txt)).alias("__w"))
    vocab = (
        toks.groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("__w").asc())
        .limit(int(vocab_size))
        .select("__w", F.lit(True).alias("__inv"))
    )
    # one probe pass yields BOTH counts — the corpus is tokenized
    # exactly twice in the whole plan (once for the vocabulary cut,
    # once for the probe; a third n_tokens-only scan was folded in
    # here), and zero-token docs re-enter via the id-only left join
    per = (
        toks.join(F.broadcast(vocab), "__w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__inv").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint")).alias(
                "n_tokens"
            ),
            F.coalesce(F.col("n_oov"), F.lit(0).cast("bigint")).alias("n_oov"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("n_oov").cast("double")
                    / F.col("n_tokens").cast("double"),
                    6,
                ),
            ).alias("oov_rate"),
        )
    )
