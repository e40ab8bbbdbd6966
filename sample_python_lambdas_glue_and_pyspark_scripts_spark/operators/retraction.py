"""Index retraction — right-to-be-forgotten over the persisted serving
artifacts.

Training-data pipelines accumulate derived artifacts per document (IVF
cells, PQ codes, BM25 postings and lengths, prefix-index rows); a
takedown or consent withdrawal must remove a document from ALL of them,
not just the corpus table. Each function here retracts a set of ids
from one index family and returns tables that serve IDENTICALLY to an
index built over the remaining corpus:

- per-doc rows (cells, codes, doclen, postings, prefix, shingles) are
  per-row deterministic given the FIXED fit artifacts (centroids,
  codebooks, dfreq), so an anti-join equals re-assign/re-encode of the
  remaining docs — the extend_* equivalence, run backwards.
- corpus-level aggregates that serving reads (BM25 ``stats``) are
  RECOMPUTED from the surviving per-doc tables (index-sized, never a
  corpus scan), which restores exact rebuild parity — BM25 scores after
  retraction are bit-identical to a fresh build on the remaining docs
  (pinned by test).

What retraction deliberately does NOT touch:

- IVF centroids / PQ codebooks / quantizer params / prefix dfreq: these
  are FIT artifacts (aggregates over many docs), kept fixed across
  extends by convention. Exception: IVF centroids are stored corpus
  VECTORS (first-k by id) — if a retracted id IS a centroid, its raw
  embedding would survive inside the index, so :func:`retract_from_ivf_index`
  REFUSES and directs a rebuild (compliance over convenience).
- the LSH corpus index's ``corpus_fp`` table: it is a distinct-md5 set
  with no doc ids, so id-keyed retraction cannot know whether a
  fingerprint is still held by a surviving duplicate — exact fp
  retraction needs a refcounted fp table; the band table (id-keyed) IS
  retracted. Documented caveat, not silent behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ids_df(retract_ids: DataFrame, id_col: str) -> DataFrame:
    cols = retract_ids.columns
    if id_col in cols:
        return retract_ids.select(id_col)
    if len(cols) == 1:
        return retract_ids.select(F.col(cols[0]).alias(id_col))
    raise ValueError(
        f"retraction: retract_ids must have an {id_col!r} column or be "
        f"single-column, got {cols}"
    )


def retract_from_ivf_index(
    index: tuple[DataFrame, DataFrame],
    retract_ids: DataFrame,
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Remove ids from an IVF index ``(centroids, corpus_cells)``.
    Refuses if a retracted id is one of the stored centroid vectors —
    the raw embedding would otherwise survive inside the index; rebuild
    with fresh centroids instead."""
    centroids, corpus_cells = index
    ids = _ids_df(retract_ids, id_col)
    hit = centroids.join(ids, id_col, "left_semi").limit(1).collect()
    if hit:
        raise ValueError(
            f"retract_from_ivf_index: id {hit[0][id_col]} is a stored "
            "centroid vector — retraction would leave its embedding in "
            "the index; rebuild the index without the retracted docs"
        )
    return centroids, corpus_cells.join(ids, id_col, "left_anti")


def retract_from_ivf_pq_index(
    index: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    retract_ids: DataFrame,
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Remove ids from an IVF-PQ index ``(centroids, corpus_cells,
    codebooks, codes)`` (flat or residual). Codebooks stay fixed (fit
    artifact — k-means means over many vectors, not per-doc data); the
    centroid-identity refusal of :func:`retract_from_ivf_index`
    applies."""
    centroids, corpus_cells, books, codes = index
    centroids, cells = retract_from_ivf_index(
        (centroids, corpus_cells), retract_ids, id_col
    )
    ids = _ids_df(retract_ids, id_col)
    return centroids, cells, books, codes.join(ids, id_col, "left_anti")


def retract_from_bm25_index(
    index: tuple[DataFrame, DataFrame, DataFrame],
    retract_ids: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Remove ids from a BM25 index ``(stats, doclen, postings)``.
    ``stats`` (n_docs, total_dl) is recomputed from the surviving
    doclen rows — index-sized, no corpus scan — so serving from the
    retracted index is BIT-IDENTICAL to a fresh build over the
    remaining docs (doc lengths are integral doubles; their sum is
    order-independent). Per-term df needs no fixup: the indexed serve
    derives it from postings."""
    _, doclen, postings = index
    ids = _ids_df(retract_ids, id_col)
    doclen2 = doclen.join(ids, id_col, "left_anti")
    postings2 = postings.join(ids, id_col, "left_anti")
    stats2 = doclen2.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    return stats2, doclen2, postings2


def retract_from_prefix_index(
    index: tuple[DataFrame, DataFrame, DataFrame],
    retract_ids: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Remove ids from a prefix intake index ``(dfreq, corpus_prefix,
    corpus_shingles)``. dfreq stays fixed (it is the ORDER artifact;
    completeness of the prefix filter holds under any fixed total
    order, so intake admission against the retracted index returns
    exactly what an index over the remaining docs returns — candidates
    may differ, the integer-exact verify makes results equal; pinned by
    test)."""
    dfreq, corpus_prefix, corpus_sh = index
    ids = _ids_df(retract_ids, id_col)
    return (
        dfreq,
        corpus_prefix.join(ids, id_col, "left_anti"),
        corpus_sh.join(ids, id_col, "left_anti"),
    )


def retract_from_lsh_corpus_index(
    index: tuple[DataFrame, DataFrame],
    retract_ids: DataFrame,
    id_col: str = "doc_id",
    fp_holders: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, DataFrame]:
    """Remove ids from the LSH intake index ``(corpus_fp,
    corpus_bands)``. The id-keyed band table is always retracted
    exactly. ``corpus_fp`` is a distinct-md5 SET without ids, so by
    itself an id cannot tell whether its fingerprint is still held by a
    surviving verbatim duplicate: without ``fp_holders`` it is left
    intact (conservative: at worst a future verbatim copy of a
    forgotten doc is still rejected as an exact dup). Pass
    ``fp_holders`` (``dedup.fingerprint_holders``'s ``(id, fp)``
    refcount table, maintained alongside the index) and fp retraction
    becomes EXACT: a fingerprint is kept iff at least one SURVIVING
    holder still carries it — equal to a rebuild over the survivors
    (pinned by test), closing the documented caveat.

    With ``fp_holders`` the return is a THREE-tuple ``(fp, bands,
    surviving_holders)``: the holders table is itself an artifact that
    must be retracted in lockstep, or a SECOND retraction against the
    stale holders keeps fingerprints of already-retracted docs alive
    forever (doc 1 and 2 share an fp, retracted in two calls — the
    stale table still lists both, so the fp never dies). Feed the
    returned holders into the next call; repeated retraction then stays
    ≡ rebuild-over-survivors (pinned by test)."""
    corpus_fp, corpus_bands = index
    ids = _ids_df(retract_ids, id_col)
    new_bands = corpus_bands.join(ids, id_col, "left_anti")
    if fp_holders is None:
        return corpus_fp, new_bands
    surviving = fp_holders.join(ids, id_col, "left_anti")
    new_fp = corpus_fp.join(
        surviving.select("fp").distinct(), "fp", "left_semi"
    )
    return new_fp, new_bands, surviving


def retract_doc_ids(
    retract_ids: DataFrame,
    corpus_tables: dict[str, DataFrame] | None = None,
    ivf_index: tuple | None = None,
    ivf_pq_index: tuple | None = None,
    bm25_index: tuple | None = None,
    prefix_index: tuple | None = None,
    lsh_corpus_index: tuple | None = None,
    prefix_state_dir: str | None = None,
    minhash_state_dir: str | None = None,
    ewma_state: tuple[str, str] | None = None,
    exactsubstr_state: tuple | None = None,
    bottomk_values_state: tuple | None = None,
    cc_state: str | None = None,
    votes_state: tuple[str, str] | None = None,
    sketch_state_dirs: dict[str, str] | None = None,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> dict:
    """Single compliance entry point: retract a set of ids from EVERY
    persisted artifact of a run by routing each named artifact to its
    family function — a takedown caller names what the run persisted
    and cannot miss a table by forgetting a per-family call.

    Batch artifacts (pure DataFrames — no side effects until the caller
    writes them back): ``corpus_tables`` ({name: id-keyed frame},
    plain anti-join), ``ivf_index`` / ``ivf_pq_index`` (keyed on
    ``vec_id_col``; the centroid-identity REFUSAL of
    :func:`retract_from_ivf_index` applies), ``bm25_index``,
    ``prefix_index``, ``lsh_corpus_index`` as ``(fp, bands)`` (partial —
    the ``corpus_fp`` caveat is surfaced in ``caveats``) or
    ``(fp, bands, fingerprint_holders)`` (exact fp retraction, no
    caveat; the artifact comes back as the same 3-tuple with the
    SURVIVING holders — persist those for the next retraction).

    Streaming states (mutate their state dirs in place; streams must
    be stopped): ``prefix_state_dir``, ``minhash_state_dir``,
    ``ewma_state=(work_dir, key_col)`` (the ids are interpreted in that
    state's KEY space), ``exactsubstr_state=(work_dir, epoch_sources)``
    or ``(work_dir, epoch_sources, text_col, min_tokens)``,
    ``bottomk_values_state=(work_dir,)`` for the anti-join form (the
    shrunken state stays a valid smaller uniform sample) or
    ``(work_dir, epoch_sources[, key_col, val_col, k])`` to rebuild hit
    epochs to the full k, ``cc_state=work_dir`` (the ids are VERTEX
    ids; hit edge epochs anti-join, label snapshots rebuild forward —
    bridge removal splits components, so no label row is merely
    filtered), ``votes_state=(work_dir, key_col)`` with key_col
    ``"annotator"`` (opt-out) or ``"item"`` (labeled-doc takedown) —
    the vote log is doubly keyed, so the anti-join is exact in either
    space.

    REFUSED up front, before anything mutates: ``sketch_state_dirs``
    ({name: dir} of HLL/CMS/Bloom register states) — registers are
    lossy or-/max-/sum-folds no operator can subtract from; the
    documented compliant path is an epoch rebuild from surviving
    sources (:func:`..streaming.state_retraction.rebuild_sketch_epoch`),
    so naming one here raises instead of silently skipping it.

    Order of operations: validation/refusals first, then the lazy batch
    artifacts, then the state-dir mutations — a refusal never leaves a
    half-retracted run. Returns ``{"artifacts": {name: retracted
    frames}, "state_counts": {name: removed-row dict}, "caveats":
    [...]}``.
    """
    if sketch_state_dirs:
        names = ", ".join(sorted(sketch_state_dirs))
        raise ValueError(
            f"retract_doc_ids: sketch register states ({names}) cannot "
            "be id-retracted — HLL/CMS/Bloom folds are irreversible. "
            "Rebuild each epoch from its surviving source rows with "
            "streaming.state_retraction.rebuild_sketch_epoch, then call "
            "this again without sketch_state_dirs."
        )
    spark = retract_ids.sparkSession
    artifacts: dict[str, object] = {}
    caveats: list[str] = []
    # batch artifacts first: pure frames, the IVF centroid-identity
    # check is the only eager step and precedes every dir mutation
    if ivf_index is not None:
        artifacts["ivf_index"] = retract_from_ivf_index(
            ivf_index, retract_ids, vec_id_col
        )
    if ivf_pq_index is not None:
        artifacts["ivf_pq_index"] = retract_from_ivf_pq_index(
            ivf_pq_index, retract_ids, vec_id_col
        )
    if bm25_index is not None:
        artifacts["bm25_index"] = retract_from_bm25_index(
            bm25_index, retract_ids, id_col
        )
    if prefix_index is not None:
        artifacts["prefix_index"] = retract_from_prefix_index(
            prefix_index, retract_ids, id_col
        )
    if lsh_corpus_index is not None:
        fp_holders = (
            lsh_corpus_index[2] if len(lsh_corpus_index) > 2 else None
        )
        # same tuple shape out as in: the 3-tuple form carries the
        # SURVIVING holders so a later retraction stays exact (stale
        # holders would keep shared fps of already-retracted docs
        # alive forever — see retract_from_lsh_corpus_index)
        artifacts["lsh_corpus_index"] = retract_from_lsh_corpus_index(
            lsh_corpus_index[:2], retract_ids, id_col, fp_holders
        )
        if fp_holders is None:
            caveats.append(
                "lsh_corpus_index: corpus_fp is a distinct-md5 set "
                "without doc ids and was left intact (conservative); "
                "pass (fp, bands, fingerprint_holders) for exact fp "
                "retraction"
            )
    for name, df in (corpus_tables or {}).items():
        artifacts[name] = df.join(
            _ids_df(retract_ids, id_col), id_col, "left_anti"
        )
    # streaming states last — these rewrite state dirs in place
    from ..streaming import state_retraction as SR

    state_counts: dict[str, dict] = {}
    if prefix_state_dir is not None:
        state_counts["prefix_state"] = SR.retract_from_prefix_state(
            spark, prefix_state_dir, retract_ids, id_col
        )
    if minhash_state_dir is not None:
        # str, or (work_dir, kwargs) when the stream ran with non-
        # default text_col / num_hashes / bands — they must match
        mh_kwargs: dict = {}
        if isinstance(minhash_state_dir, tuple):
            minhash_state_dir, mh_kwargs = minhash_state_dir
        state_counts["minhash_state"] = SR.retract_from_minhash_state(
            spark, minhash_state_dir, retract_ids, id_col=id_col,
            **mh_kwargs,
        )
    if ewma_state is not None:
        work_dir, key_col = ewma_state
        state_counts["ewma_state"] = SR.retract_from_ewma_state(
            spark, work_dir, retract_ids, key_col
        )
    if exactsubstr_state is not None:
        work_dir, epoch_sources, *rest = exactsubstr_state
        text_col = rest[0] if rest else "text"
        min_tokens = rest[1] if len(rest) > 1 else 20
        state_counts["exactsubstr_state"] = (
            SR.retract_from_exactsubstr_state(
                spark, work_dir, retract_ids, epoch_sources,
                text_col, id_col, min_tokens,
            )
        )
        caveats.append(
            "exactsubstr_state: anchors are rebuilt per hit epoch from "
            "epoch_sources; other docs' rewritten text is not "
            "re-adjudicated (removed ranges stay removed — none of the "
            "retracted content is retained)"
        )
    if bottomk_values_state is not None:
        work_dir, *rest = bottomk_values_state
        bkv_sources = rest[0] if rest else None
        bkv_key = rest[1] if len(rest) > 1 else "key"
        bkv_val = rest[2] if len(rest) > 2 else "val"
        bkv_k = rest[3] if len(rest) > 3 else 64
        state_counts["bottomk_values_state"] = (
            SR.retract_from_bottomk_values_state(
                spark, work_dir, retract_ids, bkv_sources,
                bkv_key, bkv_val, bkv_k,
            )
        )
        if bkv_sources is None:
            caveats.append(
                "bottomk_values_state: anti-join form — hit epochs now "
                "hold fewer than k rows (still a valid uniform sample "
                "of their survivors); pass epoch_sources to rebuild to "
                "the full k"
            )
    if votes_state is not None:
        work_dir, key_col = votes_state
        state_counts["votes_state"] = SR.retract_from_votes_state(
            spark, work_dir, retract_ids, key_col
        )
    if cc_state is not None:
        state_counts["cc_state"] = SR.retract_from_cc_state(
            spark, cc_state, retract_ids, id_col
        )
        caveats.append(
            "cc_state: retract ids were interpreted as VERTEX ids; "
            "label snapshots from the earliest hit epoch were rebuilt "
            "forward (components merged through a retracted vertex "
            "split back apart)"
        )
    return {
        "artifacts": artifacts,
        "state_counts": state_counts,
        "caveats": caveats,
    }
