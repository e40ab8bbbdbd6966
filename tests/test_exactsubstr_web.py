"""ExactSubstr suffix-overlap dedup (operators/dedup.py, Lee et al.
2022) and URL/domain curation (operators/web.py)."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    web as W,
)

S = " ".join(f"w{i}" for i in range(30))  # a 30-token span
T = " ".join(f"t{i}" for i in range(30))  # another, unique to doc 5


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta " + S + " gamma"),       # first occurrence
            (2, "intro unique tokens here " + S + " outro words"),
            (3, S),                                    # fully duplicate
            (4, "totally different content " + " ".join(f"z{i}" for i in range(30))),
            (5, T + " " + T),                          # self-repeat only
            (6, None),
            (7, "short doc"),
        ],
        "doc_id BIGINT, text STRING",
    )


def test_exactsubstr_rewrite_semantics(spark):
    out = {
        r["doc_id"]: r
        for r in D.exactsubstr_rewrite(_docs(spark), min_tokens=20).collect()
    }
    assert len(out) == 7  # ALL docs come back (published semantics)
    # first occurrence fully protected
    assert out[1]["n_removed"] == 0
    assert out[1]["text_dedup"].startswith("alpha beta w0")
    # later cross-doc occurrence: exactly the 30 shared tokens removed
    assert out[2]["n_removed"] == 30
    assert out[2]["text_dedup"] == "intro unique tokens here outro words"
    # fully-duplicate doc -> empty text, not dropped
    assert out[3]["n_removed"] == 30 and out[3]["text_dedup"] == ""
    # unique doc untouched
    assert out[4]["n_removed"] == 0
    # self-repeat with no earlier occurrence: ONE copy survives
    assert out[5]["n_removed"] == 30
    assert out[5]["text_dedup"] == T
    # null text and sub-threshold docs unchanged
    assert out[6]["n_tokens"] == 0 and out[6]["n_removed"] == 0
    assert out[7]["text_dedup"] == "short doc" and out[7]["n_removed"] == 0


def test_exactsubstr_removals_are_maximal_disjoint(spark):
    spans = D.exactsubstr_removals(_docs(spark), min_tokens=20).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["start"], r["end"]))
    # doc 2: S occupies token positions 4..34 (after the 4-token intro)
    assert by_doc[2] == [(4, 34)]
    # doc 3 fully covered, doc 5 keeps its first T copy
    assert by_doc[3] == [(0, 30)]
    assert by_doc[5] == [(30, 60)]
    # intervals are disjoint and non-adjacent per doc
    for doc_spans in by_doc.values():
        ordered = sorted(doc_spans)
        assert all(a[1] < b[0] for a, b in zip(ordered, ordered[1:]))


def test_exactsubstr_threshold_is_exact(spark):
    # a 19-token shared run at min_tokens=20 must NOT be removed
    R = " ".join(f"r{i}" for i in range(19))
    docs = spark.createDataFrame(
        [(1, "x " + R + " y"), (2, "p q " + R + " z")],
        "doc_id BIGINT, text STRING",
    )
    out = D.exactsubstr_rewrite(docs, min_tokens=20).collect()
    assert all(r["n_removed"] == 0 for r in out)
    # ...and at min_tokens=19 it IS removed from the later doc only
    out19 = {
        r["doc_id"]: r
        for r in D.exactsubstr_rewrite(docs, min_tokens=19).collect()
    }
    assert out19[1]["n_removed"] == 0 and out19[2]["n_removed"] == 19


def test_domain_extraction_edges(spark):
    rows = [
        (1, "https://www.example.co.uk/path?q=1", "example.co.uk"),
        (2, "http://user:pw@Sub.Example.COM:8080/x", "example.com"),
        (3, "https://a.b.github.io/page", "b.github.io"),
        (4, "https://localhost/x", "localhost"),
        (5, "not a url", ""),
        (6, None, ""),
        (7, "ftp://cdn7.media.org.au:21/f", "media.org.au"),
        (8, "https://deep.sub.tree.example.com/y", "example.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in rows], "doc_id BIGINT, url STRING"
    )
    got = {
        r["doc_id"]: r["domain"]
        for r in W.with_domain(df, "url").collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_domain_blocklist_identity_and_cap(spark):
    df = spark.createDataFrame(
        [
            (i, f"https://{'www.' if i % 2 else ''}site{i % 3}."
                f"{'co.uk' if i % 4 == 0 else 'com'}/p/{i}", 100 - i)
            for i in range(24)
        ],
        "doc_id BIGINT, url STRING, score INT",
    )
    blocklist = spark.createDataFrame(
        [("site0.co.uk",), ("site2.com",), ("absent.net",)], "domain STRING"
    )
    out = W.domain_blocklist_filter(df, "url", blocklist)
    # identity vs the plain anti-join
    plain = (
        W.with_domain(df, "url")
        .join(blocklist, "domain", "left_anti")
        .select("doc_id")
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in plain.collect()
    )
    assert 0 < out.count() < df.count()
    # per-domain cap: <= 2 rows per domain, highest score first
    capped = W.domain_capped_docs(df, "url", 2, "score")
    sizes = (
        capped.groupBy("domain").count().select("count").collect()
    )
    assert all(r["count"] <= 2 for r in sizes)
    dom0 = [
        r["doc_id"]
        for r in capped.filter(F.col("domain") == "site0.co.uk")
        .orderBy("doc_id")
        .collect()
    ]
    # domain site0.co.uk = doc_ids 0,4,8,12,16,20 (i%3==0 and i%4==0
    # -> i%12==0 for site0 + co.uk; plus i%3==0,i%4!=0 are site0.com);
    # top-2 by score desc = the two smallest ids
    assert dom0 == [0, 12]


def test_exactsubstr_rejects_bad_threshold(spark):
    with pytest.raises(ValueError):
        D.exactsubstr_removals(_docs(spark), min_tokens=0)


def test_canonical_url_rules(spark):
    rows = [
        # (url, expected canonical)
        ("HTTPS://u:p@WWW.Ex.COM:443/a/b/?utm_source=x&z=1&id=2#f",
         "https://www.ex.com/a/b?id=2&z=1"),
        ("https://www.ex.com/a/b?id=2&z=1",
         "https://www.ex.com/a/b?id=2&z=1"),
        ("http://ex.org:80/path/", "http://ex.org/path"),
        ("http://ex.org:8080/p?gclid=x&fbclid=y", "http://ex.org:8080/p"),
        ("https://ex.com/", "https://ex.com"),
        ("not a url", ""),
        (None, ""),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(rows)],
        "doc_id BIGINT, url STRING",
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", W.canonical_url("url").alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(rows):
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_keeps_min_id_and_isolates_unparseable(spark):
    df = spark.createDataFrame(
        [
            (5, "https://ex.com/a?z=1&id=2"),
            (3, "HTTPS://EX.COM:443/a/?id=2&z=1#frag"),  # same canonical
            (7, "junk one"),   # unparseable: NOT merged with each other
            (8, "junk two"),
            (9, "https://other.com/b"),
        ],
        "doc_id BIGINT, url STRING",
    )
    kept = sorted(
        r["doc_id"] for r in W.url_dedup(df, "url").collect()
    )
    assert kept == [3, 7, 8, 9]


def test_canonical_url_fragment_question_mark(spark):
    """A '?' inside the fragment is NOT a query string."""
    df = spark.createDataFrame(
        [(1, "https://ex.com/p#x?y=1"), (2, "https://ex.com/p?a=1#x?y=2")],
        "doc_id BIGINT, url STRING",
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", W.canonical_url("url").alias("c")
        ).collect()
    }
    assert got[1] == "https://ex.com/p"
    assert got[2] == "https://ex.com/p?a=1"


def test_decontaminate_spans_surgery(spark):
    """Range-surgical decontamination: only benchmark-overlapping
    ranges go; the rest of the doc survives; benchmark members rewrite
    to empty; no protection for first occurrences."""
    B = " ".join(f"b{i}" for i in range(25))   # benchmark content
    bench = spark.createDataFrame([(100, B)], "doc_id BIGINT, text STRING")
    corpus = spark.createDataFrame(
        [
            (1, "clean head words " + B + " clean tail words"),
            (2, B),                            # pure benchmark copy
            (3, "totally unrelated document content here"),
            (100, B),                          # the benchmark member itself
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r
        for r in D.decontaminate_spans(
            corpus, bench, min_tokens=20
        ).collect()
    }
    assert out[1]["n_removed"] == 25
    assert out[1]["text_dedup"] == "clean head words clean tail words"
    assert out[2]["text_dedup"] == "" and out[2]["n_removed"] == 25
    assert out[3]["n_removed"] == 0
    assert out[100]["text_dedup"] == ""  # no first-occurrence protection
    # a sub-threshold overlap is NOT removed
    small = spark.createDataFrame(
        [(4, "x " + " ".join(f"b{i}" for i in range(10)) + " y")],
        "doc_id BIGINT, text STRING",
    )
    out4 = D.decontaminate_spans(small, bench, min_tokens=20).collect()[0]
    assert out4["n_removed"] == 0


# --- anchor-key width (the 100 TB collision story) ----------------------------


def test_hash120_key_pair_matches_python_md5(spark):
    """The 120-bit anchor key is exactly (md5hex[:15], md5hex[15:30])
    as two base-16 bigints — pinned against hashlib so the DuckDB
    mirror (substr(md5(s), 1, 30)) provably groups identically."""
    import hashlib

    s = "es|" + " ".join(f"w{i}" for i in range(20))
    row = (
        spark.range(1)
        .select(*D._hash120_cols(F.md5(F.lit(s))))
        .collect()[0]
    )
    hx = hashlib.md5(s.encode()).hexdigest()
    assert row["g1"] == int(hx[:15], 16)
    assert row["g2"] == int(hx[15:30], 16)


def test_exactsubstr_collision_injection(spark):
    """A narrow anchor key makes the groupBy-count treat colliding
    distinct windows as duplicates → silent FALSE removals; the
    production 120-bit key removes nothing from an all-distinct corpus.
    (Real md5-120 collisions cannot be engineered, so the injection
    narrows the key via the test-only _sites_fn hook.)"""
    # 12 docs, every 20-token window globally unique
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"d{i}x{j}" for j in range(25)))
            for i in range(12)
        ],
        "doc_id BIGINT, text STRING",
    )

    def narrow_sites(df, text_col, id_col, L):
        # 2-bit key: distinct windows collide almost surely
        return D._exactsubstr_sites(df, text_col, id_col, L).select(
            id_col, "pos", (F.col("g1") % 4).alias("g1"),
            F.lit(0).cast("bigint").alias("g2"),
        )

    false_removals = D.exactsubstr_removals(
        docs, min_tokens=20, _sites_fn=narrow_sites
    ).count()
    assert false_removals > 0  # the collision failure mode is real
    assert D.exactsubstr_removals(docs, min_tokens=20).count() == 0


def test_subtract_intervals_endpoint_sweep(spark):
    """Interval-algebra subtraction: extents equal the per-position
    set difference, outputs are maximal and disjoint."""
    rem = spark.createDataFrame(
        [(1, 0, 10), (1, 15, 20), (2, 5, 8)],
        "doc_id BIGINT, start INT, end INT",
    )
    prot = spark.createDataFrame(
        [(1, 3, 5), (1, 9, 16), (2, 5, 8), (3, 0, 4)],
        "doc_id BIGINT, start INT, end INT",
    )
    got = sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in D._subtract_intervals(rem, prot, "doc_id").collect()
    )
    assert got == [(1, 0, 3), (1, 5, 9), (1, 16, 20)]


# --- fused ExactSubstr + decontamination (one corpus tokenize) -----------------


def test_exactsubstr_decon_rewrite_equals_composed(spark):
    B = " ".join(f"b{i}" for i in range(15))       # benchmark content (>=13)
    bench = spark.createDataFrame([(100, B)], "doc_id BIGINT, text STRING")
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta " + S + " gamma"),      # first occurrence of S
            (2, "intro unique tokens here " + S + " outro words"),
            (3, "clean head words " + B + " clean tail words"),
            (4, "totally unrelated content here today friends"),
            (5, None),
        ],
        "doc_id BIGINT, text STRING",
    )
    fused = {
        r["doc_id"]: r
        for r in D.exactsubstr_decon_rewrite(
            corpus, bench, min_tokens=20, decon_min_tokens=13
        ).collect()
    }
    # composed reference on the ORIGINAL text: es extents U decon extents
    es = D.exactsubstr_removals(corpus, min_tokens=20)
    dc_sites = D._exactsubstr_sites(corpus, "text", "doc_id", 13).join(
        D._exactsubstr_sites(bench, "text", "doc_id", 13)
        .select("g1", "g2").distinct(),
        ["g1", "g2"],
    ).select("doc_id", "pos")
    dc = D._merge_intervals(dc_sites, "doc_id", 13)
    combined = D._merge_general_intervals(es.unionByName(dc), "doc_id")
    want = {
        r["doc_id"]: r
        for r in D.rewrite_without_ranges(corpus, combined).collect()
    }
    assert set(fused) == set(want) == {1, 2, 3, 4, 5}
    for k in want:
        for c in ("text_dedup", "n_tokens", "n_removed"):
            assert fused[k][c] == want[k][c], (k, c)
    # semantics spot checks: dup removed from doc 2, benchmark from doc 3
    assert fused[2]["n_removed"] == 30
    assert fused[3]["text_dedup"] == "clean head words clean tail words"
    assert fused[4]["n_removed"] == 0 and fused[5]["n_tokens"] == 0


def test_exactsubstr_decon_rewrite_single_corpus_tokenize(spark, sf_dir):
    """The fusion claim, plan-pinned: the shared position-entry frame
    tokenizes the corpus EXACTLY once (one regexp_extract_all, not
    re-inlined into a pushed filter), and the fused operator consumes
    it through one localCheckpoint — so the anchor count, the
    benchmark probe, and the rewrite tail all read one materialized
    tokenize (the sequential stage pair pays 7 tokenize projections
    and two corpus scan pipelines)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    entries = D._fused_position_entries(docs, "text", "doc_id", 20, 13)
    ex = entries._jdf.queryExecution().executedPlan().toString()
    assert ex.count("regexp_extract_all") == 1
    assert "EvalPython" not in ex and "InPandas" not in ex


def test_interval_algebra_randomized_vs_bruteforce(spark):
    """Seeded randomized sweep of the interval operators against
    brute-force position sets — 40 cases batched into ONE job each
    (case_id rides the doc key), covering overlap/touch/containment/
    empty-side shapes the hand-written cases can miss."""
    import random

    rng = random.Random(20260815)
    rem_rows, prot_rows, expect_sub = [], [], {}
    gen_rows, expect_mrg = [], {}
    for case in range(40):
        # disjoint removal intervals (the _merge_intervals contract)
        def disjoint(rng, n):
            out, cur = [], 0
            for _ in range(n):
                cur += rng.randint(1, 4)
                ln = rng.randint(1, 6)
                out.append((cur, cur + ln))
                cur += ln
            return out

        rem = disjoint(rng, rng.randint(0, 4))
        prot = disjoint(rng, rng.randint(0, 4))
        rem_rows += [(case, s, e) for s, e in rem]
        prot_rows += [(case, s, e) for s, e in prot]
        rpos = {p for s, e in rem for p in range(s, e)}
        ppos = {p for s, e in prot for p in range(s, e)}
        keep = sorted(rpos - ppos)
        exp = []
        for p in keep:  # positions -> maximal extents
            if exp and exp[-1][1] == p:
                exp[-1][1] = p + 1
            else:
                exp.append([p, p + 1])
        expect_sub[case] = [tuple(x) for x in exp]
        # arbitrary possibly-overlapping intervals for the general merge
        gen = [
            (s, s + rng.randint(1, 7))
            for s in (rng.randint(0, 25) for _ in range(rng.randint(0, 6)))
        ]
        gen_rows += [(case, s, e) for s, e in gen]
        gpos = {p for s, e in gen for p in range(s, e)}
        exp2, last = [], None
        for p in sorted(gpos):
            if exp2 and exp2[-1][1] == p:
                exp2[-1][1] = p + 1
            else:
                exp2.append([p, p + 1])
        # touching intervals merge in _merge_general_intervals, and the
        # position-set reconstruction above already merges adjacency
        expect_mrg[case] = [tuple(x) for x in exp2]

    sch = "doc_id BIGINT, start INT, end INT"
    rem_df = spark.createDataFrame(rem_rows or [(999, 0, 1)], sch)
    prot_df = spark.createDataFrame(prot_rows or [(998, 0, 1)], sch)
    got_sub = {}
    for r in D._subtract_intervals(rem_df, prot_df, "doc_id").collect():
        got_sub.setdefault(r["doc_id"], []).append((r["start"], r["end"]))
    for case, exp in expect_sub.items():
        assert sorted(got_sub.get(case, [])) == exp, ("sub", case)

    gen_df = spark.createDataFrame(gen_rows or [(999, 0, 1)], sch)
    got_mrg = {}
    for r in D._merge_general_intervals(gen_df, "doc_id").collect():
        got_mrg.setdefault(r["doc_id"], []).append((r["start"], r["end"]))
    for case, exp in expect_mrg.items():
        assert sorted(got_mrg.get(case, [])) == exp, ("merge", case)
