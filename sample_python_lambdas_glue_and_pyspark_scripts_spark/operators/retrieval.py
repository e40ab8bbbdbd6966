"""Rank fusion for hybrid (lexical + semantic) retrieval.

Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): given
N ranked candidate lists for the same query, score every candidate by
``sum over lists of 1 / (k0 + rank)`` and re-rank. RRF is the standard
zero-tuning fuser for BM25 + embedding retrieval stacks because it only
consumes RANKS — the lexical and cosine score scales never have to be
calibrated against each other.

Scale posture: fusion runs over top-k CUTS (k rows per list, k ≤ a few
hundred), never over the corpora — the expensive work happens inside
the underlying retrievers, which have their own scale paths
(``text.bm25_scores_indexed`` serves from the persisted inverted index,
``similarity.ivf_topk`` from the IVF index). The join chain here is
k-row × k-row and broadcastable; the global rank windows are over
already-cut lists, so the single-partition window is bounded by k, not
by the corpus.

Determinism contract (parity kit): ranks are assigned over (rounded
score DESC, id ASC); RRF contributions ``1/(k0 + rank)`` are exact IEEE
divisions accumulated in fixed list order via a chained full-outer
join — NO floating-point aggregation, so no partial-aggregation-order
ambiguity — and the fused score rounds to 6dp before the final cut.

Reference parity note: the reference repo has no retrieval stack; this
module is part of the beyond-reference training-data/RAG shelf
(SURVEY.md §7.1), composing the BM25 (text.py) and ANN (similarity.py)
operators the same way its pipelines compose validation + load steps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_list(
    df: DataFrame,
    score_col: str,
    id_col: str,
    ascending: bool = False,
) -> DataFrame:
    """Attach a deterministic 1-based ``rank`` to a (small) scored list.

    Ordering is (score, id) with the id ascending tiebreak — callers
    must pass scores already rounded (the parity kit's 6dp contract) so
    the rank, and therefore the fusion, is identical across engines.
    Uses a global ``row_number`` window: the input is a top-k cut, so
    the single-partition sort is over ≤ k rows by construction.
    """
    s = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.orderBy(s, F.col(id_col).asc())
    return df.select(
        F.col(id_col), F.row_number().over(w).cast("int").alias("rank")
    )


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    id_col: str,
    k0: int = 60,
    top_k: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Fuse named rank lists with reciprocal-rank fusion.

    ``ranked`` is ``[(name, df)]`` where each df has (id_col, rank).
    Output: ``(id_col, rrf_score, <name>_rank ...)`` — one nullable
    rank column per input list, fused score rounded to ``round_to``,
    optionally cut to the global top-k on (rrf_score DESC, id ASC).

    The fusion is a chained full-outer join in list order: candidates
    missing from a list contribute 0.0 for it (standard top-k RRF), and
    the additions happen left-to-right in a single projection — exact
    and engine-reproducible, unlike a float SUM aggregate.
    """
    if not ranked:
        raise ValueError("rrf_fuse: no rank lists")
    out: DataFrame | None = None
    names: list[str] = []
    for name, df in ranked:
        if name in names:
            raise ValueError(f"rrf_fuse: duplicate list name {name!r}")
        names.append(name)
        r = df.select(F.col(id_col), F.col("rank").alias(f"{name}_rank"))
        out = r if out is None else out.join(r, on=id_col, how="full_outer")
    assert out is not None
    expr: Column | None = None
    for name in names:
        contrib = F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        expr = contrib if expr is None else expr + contrib
    fused = out.select(
        F.col(id_col),
        F.round(expr, round_to).alias("rrf_score"),
        *[F.col(f"{n}_rank") for n in names],
    )
    if top_k is not None:
        fused = fused.orderBy(
            F.col("rrf_score").desc(), F.col(id_col).asc()
        ).limit(int(top_k))
    return fused


def hybrid_rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k_each: int = 50,
    k0: int = 60,
    top_k: int = 10,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search: BM25 top-``k_each`` ∪ cosine top-``k_each``, RRF-fused.

    The lexical list comes from ``text.bm25_scores`` over ``docs``; the
    semantic list from ``similarity.cosine_topk`` with the stored vector
    of ``query_vec_id`` as the query (excluded from its own results, as
    cosine_topk always does — it may still surface lexically, which is
    correct rank-fusion semantics). Output:
    ``(doc_id, rrf_score, lex_rank, sem_rank)`` top-``top_k``.

    At scale both retrievers swap for their indexed forms
    (``bm25_scores_indexed``, ``ivf_topk``) without touching the fusion.
    """
    from .similarity import cosine_topk
    from .text import bm25_scores

    lex = bm25_scores(docs, query_terms, text_col=text_col,
                      id_col=doc_id_col, top_k=k_each)
    lex_ranked = rank_list(lex, "bm25", doc_id_col)
    sem = cosine_topk(
        emb,
        emb.filter(F.col(vec_id_col) == query_vec_id),
        k=k_each,
        id_col=vec_id_col,
        vec_col=vec_col,
    ).select(F.col("neighbor_id").alias(doc_id_col), F.col("sim"))
    sem_ranked = rank_list(sem, "sim", doc_id_col)
    return rrf_fuse(
        [("lex", lex_ranked), ("sem", sem_ranked)],
        id_col=doc_id_col,
        k0=k0,
        top_k=top_k,
    )
