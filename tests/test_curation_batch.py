"""Batch curation cascade (plans/curation_batch.py): wrapper ≡ the
stages applied sequentially by hand, census correctness, stage
optionality."""

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    web as W,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans.curation_batch import (
    curate_corpus,
)

S = " ".join(
    "the quick brown fox jumps over the lazy dog and then it runs far "
    "away into the deep green forest to find some food".split()
)


def _docs(spark):
    rows = [
        # URL dups: 1 and 2 share a canonical URL (2 dropped at stage 1)
        (1, "the first document is about spark plans and it is long enough "
            "to pass the quality cut with several common stopwords in it.",
         "https://a.com/x?id=1"),
        (2, "same url different text entirely here with many more words and "
            "the usual stopwords to pass quality checks in this fixture.",
         "HTTPS://A.COM:443/x/?id=1#frag"),
        # exact text dups: 3 and 4 (4 dropped at stage 2)
        (3, "the second distinct document body is about catalyst and codegen "
            "and it also has enough length and stopwords to be kept now.",
         "https://b.com/y"),
        (4, "the second distinct document body is about catalyst and codegen "
            "and it also has enough length and stopwords to be kept now.",
         "https://c.com/z"),
        # 5 and 6 share the 24-token span S; the FIRST occurrence is
        # doc 5 (min (doc_id, pos) wins) -> doc 6 gets it removed
        (6, "intro words " + S + " and a closing remark to finish the text "
            "which is itself long enough to survive the quality filter.",
         "https://d.com/p"),
        (5, S + " but this tail is fresh and long enough that the document "
            "still survives the quality filter after the span is removed ok.",
         "https://e.com/q"),
        # low quality (too short) -> dropped at stage 4
        (7, "tiny doc", "https://f.com/r"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, url STRING")


def test_cascade_equals_sequential_stages(spark):
    docs = _docs(spark)
    kept, report = curate_corpus(
        docs, url_col="url", exactsubstr_min_tokens=20, min_quality=0.66,
    )
    got = {r["doc_id"]: r for r in kept.collect()}
    census = {r["stage"]: r["n_docs"] for r in report.collect()}
    # hand-applied stages
    s1 = W.url_dedup(docs, "url")                       # drops 2
    s2 = s1.join(D.exact_dedup(s1).select("doc_id"), "doc_id", "left_semi")
    assert census["url_dedup"] == s1.count() == 6
    assert census["exact_dedup"] == s2.count() == 5
    # rewriting: doc 5 holds the FIRST occurrence of the 24-token span
    # (min (doc_id, pos)); doc 6's copy is removed
    assert got[5]["n_removed"] == 0
    assert got[6]["n_removed"] == 24
    assert got[6]["text"].startswith("intro words and a closing remark")
    assert S.lower() not in got[6]["text"]
    assert S.lower() in got[5]["text"]
    # quality: doc 7 out
    assert 7 not in got and census["quality_filter"] == len(got)
    assert set(got) == {1, 3, 5, 6}
    # census order matches the cascade order
    assert [r["stage"] for r in report.collect()] == [
        "url_dedup", "exact_dedup", "exactsubstr_rewrite", "quality_filter",
    ]


def test_cascade_optional_stages(spark):
    docs = _docs(spark).drop("url")
    kept, report = curate_corpus(
        docs, exactsubstr_min_tokens=None, min_quality=None,
    )
    # only exact dedup ran: doc 4 (verbatim copy of 3) dropped
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3, 5, 6, 7]
    assert [r["stage"] for r in report.collect()] == ["exact_dedup"]
    assert "n_removed" not in kept.columns


def test_cascade_domain_cap_and_budget(spark):
    docs = spark.createDataFrame(
        [
            (i,
             "the document number %d has plenty of common stopwords and a "
             "reasonable length so it passes every quality heuristic." % i,
             f"https://site{i % 2}.com/p/{i}")
            for i in range(8)
        ],
        "doc_id BIGINT, text STRING, url STRING",
    )
    kept, report = curate_corpus(
        docs, url_col="url", exactsubstr_min_tokens=None,
        min_quality=None, n_per_domain=2, token_budget=40,
    )
    census = {r["stage"]: r["n_docs"] for r in report.collect()}
    # cap: 2 sites x 2 kept = 4 (lowest doc_id first, ascending order)
    assert census["domain_cap"] == 4
    assert sorted(r["doc_id"] for r in kept.collect())[:2] == [0, 1]
    # budget: each doc ~19 words -> 2 fit in 40 tokens
    assert census["token_budget"] == 2


def test_cascade_fused_decontamination_stage(spark):
    """benchmark= + ExactSubstr → ONE fused stage
    (exactsubstr_decon_rewrite), equal to applying the fused operator
    by hand on the post-exact-dedup survivors."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.dedup import (
        exactsubstr_decon_rewrite,
    )

    S = " ".join(f"w{i}" for i in range(25))
    B = " ".join(f"b{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + S + " gamma"),
            (2, "intro words here " + S + " outro"),
            (3, "head " + B + " tail"),
            (4, "totally unrelated content right here"),
        ],
        "doc_id BIGINT, text STRING",
    )
    bench = spark.createDataFrame([(9, B)], "doc_id BIGINT, text STRING")
    kept, report = curate_corpus(
        docs, exactsubstr_min_tokens=20, benchmark=bench,
        decon_min_tokens=13,
    )
    census = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert "exactsubstr_decon_rewrite" in census
    want = {
        r["doc_id"]: r["text_dedup"]
        for r in exactsubstr_decon_rewrite(
            docs, bench, min_tokens=20, decon_min_tokens=13
        ).collect()
    }
    got = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert got == want
    # decon-only form (no ExactSubstr) takes the decontaminate_spans path
    _, rep2 = curate_corpus(
        docs, exactsubstr_min_tokens=None, benchmark=bench,
        decon_min_tokens=13,
    )
    assert "decontaminate_spans" in {r["stage"] for r in rep2.collect()}


def test_cascade_hot_domain_lever_three_way_equal(spark):
    """n_salts / hot_min_rows pass through to the domain-cap stage and
    leave the cascade's kept set and census IDENTICAL (the measured
    hot-domain levers never change semantics, only the plan)."""
    docs = spark.createDataFrame(
        [
            (i,
             "the document number %d has plenty of common stopwords and a "
             "reasonable length so it passes every quality heuristic." % i,
             # 94%-hot shape: almost everything on one domain
             f"https://hot.com/p/{i}" if i % 16 else f"https://c{i}.com/p")
            for i in range(32)
        ],
        "doc_id BIGINT, text STRING, url STRING",
    )
    results = []
    for kw in (
        {},
        {"n_salts": 4},
        {"n_salts": 4, "hot_min_rows": 8},
    ):
        kept, report = curate_corpus(
            docs, url_col="url", exactsubstr_min_tokens=None,
            n_per_domain=3, **kw,
        )
        results.append(
            (
                sorted(r["doc_id"] for r in kept.collect()),
                sorted(map(tuple, report.collect())),
            )
        )
    assert results[0] == results[1] == results[2]


def test_cascade_c4_stage_zero(spark):
    """c4_clean runs FIRST: dropped docs never reach later stages and
    survivors carry the cleaned text into exact dedup (two docs that
    differ only in dropped lines collapse to one)."""
    keep = "this line is long enough and ends with a period."
    rows = [
        # 1 and 2 identical after cleaning (different junk lines)
        (1, keep + "\njunk no punct\n" + keep, "https://a.com/1"),
        (2, keep + "\nother junk line\n" + keep, "https://b.com/2"),
        # 3 dropped by C4 (nothing survives the line filter)
        (3, "no terminal punctuation anywhere here", "https://c.com/3"),
        # 4 survives distinctly
        (4, keep + "\nanother quite different long sentence ends too.",
         "https://d.com/4"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, url STRING"
    )
    kept, report = curate_corpus(
        docs, url_col="url", exactsubstr_min_tokens=None,
        c4_clean={"min_kept_lines": 1},
    )
    census = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert census["c4_line_clean"] == 3          # doc 3 gone at stage 0
    assert census["exact_dedup"] == 2            # 1 and 2 collapsed
    out = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(out) == {1, 4}
    assert out[1] == keep + "\n" + keep          # cleaned text forward


def test_cascade_pii_scrub_is_last_stage(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.text import (
        scrub_text,
    )

    docs = _docs(spark).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" contact someone@example.com or 12345.")),
    )
    plain, rep_plain = curate_corpus(
        docs, url_col="url", exactsubstr_min_tokens=20, min_quality=0.5,
    )
    scrubbed, rep_scrub = curate_corpus(
        docs, url_col="url", exactsubstr_min_tokens=20, min_quality=0.5,
        scrub_pii=True,
    )
    # identical kept ids: masking happens after every content decision
    ids_plain = sorted(r["doc_id"] for r in plain.select("doc_id").collect())
    ids_scrub = sorted(r["doc_id"] for r in scrubbed.select("doc_id").collect())
    assert ids_scrub == ids_plain
    # scrubbed output == scrub_text applied to the plain cascade output
    expect = {
        r["doc_id"]: r["scrubbed"]
        for r in scrub_text(plain, "text").collect()
    }
    got = {r["doc_id"]: r["text"] for r in scrubbed.collect()}
    assert got == expect
    # the rewrite stage re-emits normalized word tokens, so the email's
    # @ is gone before scrubbing — but the number token survives and
    # must be masked, and no raw digit run remains anywhere
    assert any("<NUM>" in t for t in got.values())
    assert not any("12345" in t for t in got.values())
    # census gained exactly the one extra stage with the same final count
    stages = [r["stage"] for r in rep_scrub.collect()]
    assert stages[-1] == "pii_scrub"
    final_count = {r["stage"]: r["n_docs"] for r in rep_scrub.collect()}
    assert final_count["pii_scrub"] == len(ids_plain)


def test_cascade_drop_ledger(spark):
    docs = _docs(spark)
    kept, report, ledger = curate_corpus(
        docs, url_col="url", exactsubstr_min_tokens=20, min_quality=0.66,
        return_ledger=True,
    )
    led = {r["doc_id"]: r["dropped_at"] for r in ledger.collect()}
    # every input doc is accounted for exactly once
    assert sorted(led) == sorted(r["doc_id"] for r in docs.collect())
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert {d for d, s in led.items() if s == "kept"} == kept_ids
    # doc 4 is the exact-text dup of 3; doc 7 is the low-quality one
    assert led[4] == "exact_dedup"
    assert led[7] == "quality_filter"
    # ledger counts reconcile with the census: stage n_docs equals
    # (docs not yet dropped) at that stage
    census = {r["stage"]: r["n_docs"] for r in report.collect()}
    n_in = docs.count()
    order = [r["stage"] for r in report.collect()]
    running = n_in
    from collections import Counter

    drops = Counter(led.values())
    for st in order:
        running -= drops.get(st, 0)
        assert census[st] == running, st
