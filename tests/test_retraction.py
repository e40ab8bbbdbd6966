"""Index retraction (operators/retraction.py): rebuild parity per
family, centroid-identity refusal, fixed fit artifacts."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    retraction as R,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    similarity as S,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    text as T,
)


def _ids(spark, vals, col="doc_id"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} bigint")


def test_retract_bm25_serves_identically_to_rebuild(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    gone = _ids(spark, [2, 5, 8])
    remaining = docs.join(gone, "doc_id", "left_anti")
    retracted = R.retract_from_bm25_index(
        T.build_bm25_index(docs), gone
    )
    rebuilt = T.build_bm25_index(remaining)
    q = ["table", "scan", "hash", "window"]
    a = T.bm25_scores_indexed(retracted, q, top_k=10)
    b = T.bm25_scores_indexed(rebuilt, q, top_k=10)
    key = lambda r: tuple(r)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_retract_ivf_pq_equals_reassign_of_remaining(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, cells = S.build_ivf_index(emb, ncells=4)
    books = S.pq_fit(emb, m_sub=4, k_codes=4, n_iter=2)
    codes = S.pq_encode(emb, books)
    gone = _ids(spark, [7, 9, 30], col="vec_id")
    _, cells2, _, codes2 = R.retract_from_ivf_pq_index(
        (cents, cells, books, codes), gone
    )
    remaining = emb.join(gone, "vec_id", "left_anti")
    ref_cells = S.assign_cells(remaining, cents, nprobe=1)
    ref_codes = S.pq_encode(remaining, books)
    assert sorted(
        (r["vec_id"], r["cell"]) for r in cells2.collect()
    ) == sorted((r["vec_id"], r["cell"]) for r in ref_cells.collect())
    assert sorted(
        (r["vec_id"], r["sub"], r["code"]) for r in codes2.collect()
    ) == sorted(
        (r["vec_id"], r["sub"], r["code"]) for r in ref_codes.collect()
    )


def test_retract_refuses_centroid_ids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index = S.build_ivf_index(emb, ncells=4)
    # centroids are the first 4 vec_ids — retracting id 1 must refuse
    with pytest.raises(ValueError, match="centroid"):
        R.retract_from_ivf_index(index, _ids(spark, [1], col="vec_id"))


def test_retract_prefix_index_admission_equals_rebuild(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different corpus text about spark engines"),
            (3, "a third unrelated doc on parquet row group compression"),
        ],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            # near-copy of RETRACTED doc 2 -> must be ADMITTED post-retract
            (10, "completely different corpus text about spark planes"),
            # near-copy of surviving doc 1 -> still rejected
            (11, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id bigint, text string",
    )
    gone = _ids(spark, [2])
    retracted = R.retract_from_prefix_index(
        D.build_prefix_index(corpus), gone
    )
    rebuilt = D.build_prefix_index(corpus.join(gone, "doc_id", "left_anti"))
    a = sorted(
        r["doc_id"]
        for r in D.prefix_dedup_against_corpus(batch, retracted).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in D.prefix_dedup_against_corpus(batch, rebuilt).collect()
    )
    assert a == b == [10]


def test_retract_lsh_bands_and_ids_df_validation(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    fp, bands = D.build_corpus_index(corpus)
    fp2, bands2 = R.retract_from_lsh_corpus_index((fp, bands), _ids(spark, [1]))
    assert bands2.filter(F.col("doc_id") == 1).count() == 0
    assert bands2.filter(F.col("doc_id") == 2).count() > 0
    assert fp2.count() == fp.count()  # fp set intact (documented caveat)
    with pytest.raises(ValueError, match="retract_ids"):
        R._ids_df(
            spark.createDataFrame([(1, 2)], "x bigint, y bigint"), "doc_id"
        )


def test_retract_doc_ids_routes_every_family(spark, sf_dir, tmp_path):
    """One compliance call covers every persisted artifact of a run:
    batch indexes come back retracted (equal to the per-family calls),
    streaming state dirs are rewritten, refusals fire up front."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.prefix_intake import (
        make_batch_fn as pf_batch_fn,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.exactsubstr_intake import (
        make_batch_fn as es_batch_fn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    gone = _ids(spark, [2, 5, 8])
    gone_vec = _ids(spark, [7, 9], col="vec_id")

    b0 = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    pdir, edir = str(tmp_path / "pf"), str(tmp_path / "es")
    pf_batch_fn(pdir)(b0, 0)
    es_batch_fn(edir)(b0, 0)

    # sketch registers refuse BEFORE anything mutates
    with pytest.raises(ValueError, match="irreversible"):
        R.retract_doc_ids(gone, sketch_state_dirs={"hll": "/x"})

    out = R.retract_doc_ids(
        gone,
        corpus_tables={"documents": docs},
        bm25_index=T.build_bm25_index(docs),
        prefix_index=D.build_prefix_index(
            docs.select("doc_id", "text")
        ),
        lsh_corpus_index=D.build_corpus_index(
            docs.select("doc_id", "text")
        ),
        prefix_state_dir=pdir,
        exactsubstr_state=(edir, {0: b0}),
    )
    ivf_out = R.retract_doc_ids(
        gone_vec, ivf_index=S.build_ivf_index(emb, ncells=4)
    )

    # every named artifact present; retracted ids gone from id-keyed rows
    assert set(out["artifacts"]) == {
        "documents", "bm25_index", "prefix_index", "lsh_corpus_index"
    }
    assert out["artifacts"]["documents"].filter(
        F.col("doc_id").isin(2, 5, 8)
    ).count() == 0
    _, doclen, postings = out["artifacts"]["bm25_index"]
    assert doclen.filter(F.col("doc_id").isin(2, 5, 8)).count() == 0
    assert postings.filter(F.col("doc_id").isin(2, 5, 8)).count() == 0
    _, cells = ivf_out["artifacts"]["ivf_index"]
    assert cells.filter(F.col("vec_id").isin(7, 9)).count() == 0
    # the corpus_fp caveat is surfaced, not silent
    assert any("corpus_fp" in c for c in out["caveats"])
    # streaming states rewritten on disk
    assert out["state_counts"]["prefix_state"]["kept"] > 0
    assert out["state_counts"]["exactsubstr_state"]["kept"] > 0
    for table in ("prefix", "shingles", "kept"):
        left = spark.read.parquet(f"{pdir}/{table}").filter(
            F.col("doc_id").isin(2, 5, 8)
        )
        assert left.count() == 0, table
    assert spark.read.parquet(f"{edir}/kept").filter(
        F.col("doc_id").isin(2, 5, 8)
    ).count() == 0
    # centroid-identity refusal propagates through the orchestrator
    with pytest.raises(ValueError, match="centroid"):
        R.retract_doc_ids(
            _ids(spark, [0], col="vec_id"),
            ivf_index=S.build_ivf_index(emb, ncells=4),
        )


def test_retract_lsh_fp_exact_with_holders(spark):
    """r11: fingerprint_holders closes the corpus_fp caveat — with the
    (id, fp) refcount table, fp retraction equals a rebuild over the
    survivors: a fingerprint survives iff a surviving doc still holds
    it (verbatim duplicates keep it alive; sole holders take it away)."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),   # verbatim copy of 1
            (3, "epsilon zeta eta theta"),
        ],
        "doc_id bigint, text string",
    )
    fp, bands = D.build_corpus_index(corpus)
    holders = D.fingerprint_holders(corpus)

    # retract 1: its fp survives via the verbatim copy 2; the holders
    # come back retracted too (3-tuple form, r12)
    fp2, bands2, holders2 = R.retract_from_lsh_corpus_index(
        (fp, bands), _ids(spark, [1]), fp_holders=holders
    )
    assert fp2.count() == 2
    assert holders2.filter(F.col("doc_id") == 1).count() == 0
    # retract 1 AND 2: the shared fp dies; 3's stays
    fp3, _, _ = R.retract_from_lsh_corpus_index(
        (fp, bands), _ids(spark, [1, 2]), fp_holders=holders
    )
    rebuilt_fp, _ = D.build_corpus_index(
        corpus.filter(~F.col("doc_id").isin([1, 2]))
    )
    assert sorted(r["fp"] for r in fp3.collect()) == sorted(
        r["fp"] for r in rebuilt_fp.collect()
    )

    # routed form: the 3-tuple drops the caveat
    out = R.retract_doc_ids(
        _ids(spark, [1, 2]), lsh_corpus_index=(fp, bands, holders)
    )
    got_fp, got_bands, got_holders = out["artifacts"]["lsh_corpus_index"]
    assert sorted(r["fp"] for r in got_fp.collect()) == sorted(
        r["fp"] for r in rebuilt_fp.collect()
    )
    assert not any("lsh_corpus_index" in c for c in out["caveats"])
    # 2-tuple form keeps the conservative caveat
    out2 = R.retract_doc_ids(_ids(spark, [1]), lsh_corpus_index=(fp, bands))
    assert any("lsh_corpus_index" in c for c in out2["caveats"])


def test_retract_lsh_fp_sequential_retraction_stays_exact(spark):
    """r12 (ADVICE r11): two retractions in sequence must equal a
    rebuild over the final survivors — the second call consumes the
    SURVIVING holders returned by the first. With the pre-fix stale
    holders, an fp shared by docs 1 and 2 retracted in two separate
    calls survived forever (each call saw the other doc as a live
    holder)."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),   # verbatim copy of 1
            (3, "epsilon zeta eta theta"),
        ],
        "doc_id bigint, text string",
    )
    fp, bands = D.build_corpus_index(corpus)
    holders = D.fingerprint_holders(corpus)

    fp1, bands1, holders1 = R.retract_from_lsh_corpus_index(
        (fp, bands), _ids(spark, [1]), fp_holders=holders
    )
    fp2, bands2, holders2 = R.retract_from_lsh_corpus_index(
        (fp1, bands1), _ids(spark, [2]), fp_holders=holders1
    )
    rebuilt_fp, rebuilt_bands = D.build_corpus_index(
        corpus.filter(F.col("doc_id") == 3)
    )
    assert sorted(r["fp"] for r in fp2.collect()) == sorted(
        r["fp"] for r in rebuilt_fp.collect()
    )
    assert holders2.count() == holders2.filter(F.col("doc_id") == 3).count()
    # the STALE-holders sequence over-retains (regression witness for
    # the bug this pins against): feeding the original holders into
    # call 2 keeps the shared fp of docs 1 and 2 alive
    fp2_stale, _, _ = R.retract_from_lsh_corpus_index(
        (fp1, bands1), _ids(spark, [2]), fp_holders=holders
    )
    assert fp2_stale.count() == fp2.count() + 1
