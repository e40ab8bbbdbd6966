"""BPE vocabulary induction (operators/bpe.py): the Sennrich corpus,
merge determinism, left-greedy overlap handling, OOV segmentation."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import bpe as B

CLASSIC = (
    "low low low low low lower lower "
    "newest newest newest newest newest newest "
    "widest widest widest"
)


def test_bpe_train_classic_corpus(spark):
    df = spark.createDataFrame([(1, CLASSIC)], ["doc_id", "text"])
    merges, seg = B.bpe_train(B.word_vocab(df), n_merges=5)
    # canonical first merges from Sennrich et al. 2016 §3.2's example
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")
    ]
    syms = {r["word"]: list(r["syms"]) for r in seg.collect()}
    assert syms["newest"] == ["n", "e", "w", "est</w>"]
    assert syms["low"] == ["low", "</w>"]


def test_bpe_train_deterministic_and_early_stop(spark):
    df = spark.createDataFrame([(1, CLASSIC)], ["doc_id", "text"])
    v = B.word_vocab(df)
    m1, _ = B.bpe_train(v, n_merges=8)
    m2, _ = B.bpe_train(v, n_merges=8)
    assert m1 == m2  # count-desc then lexicographic tie-break
    # a corpus of single characters fully merges, then stops early
    tiny = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    merges, seg = B.bpe_train(B.word_vocab(tiny), n_merges=50)
    assert len(merges) < 50
    assert all(r["syms"] == [r["word"] + "</w>"] for r in seg.collect())


def test_merge_pair_left_greedy_non_overlapping(spark):
    # 'aaa</w>' merging (a,a): left-greedy -> [aa, a, </w>], never [a, aa, ...]
    df = spark.createDataFrame([(["a", "a", "a", "</w>"],)], ["syms"])
    out = df.select(B._merge_pair(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert list(out) == ["aa", "a", "</w>"]
    # and four a's -> two merges
    df4 = spark.createDataFrame([(["a", "a", "a", "a"],)], ["syms"])
    out4 = df4.select(B._merge_pair(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert list(out4) == ["aa", "aa"]


def test_bpe_segment_vocab_join_and_oov_fallback(spark):
    train = spark.createDataFrame([(1, CLASSIC)], ["doc_id", "text"])
    _, seg = B.bpe_train(B.word_vocab(train), n_merges=10)
    apply_df = spark.createDataFrame(
        [(1, "low newest"), (2, "zebra"), (3, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in B.bpe_segment(apply_df, seg).collect()}
    seg_sizes = {r["word"]: len(r["syms"]) for r in seg.collect()}
    assert rows[1]["n_bpe_tokens"] == seg_sizes["low"] + seg_sizes["newest"]
    # OOV word falls back to characters + </w>
    assert rows[2]["n_bpe_tokens"] == len("zebra") + 1
    assert 3 not in rows  # no tokens -> no row (unigram-scorer contract)


def test_word_vocab_min_count(spark):
    df = spark.createDataFrame([(1, "x x x y")], ["doc_id", "text"])
    v = B.word_vocab(df, min_count=2)
    assert [r["word"] for r in v.collect()] == ["x"]


# --- count-min sketch (operators/sketches.py) --------------------------------


def test_cms_never_undercounts_and_merges(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    rows = [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    sk = SK.count_min_sketch(df, "k", width=8, depth=3)  # tiny -> collisions
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("never",)], ["k"])
    est = {r["k"]: r["est"] for r in
           SK.cms_estimate(sk, keys, "k", width=8, depth=3).collect()}
    truth = {"a": 50, "b": 7, "c": 3, "d": 1, "never": 0}
    for k, t in truth.items():
        assert est[k] >= t  # one-sided error
    assert est["a"] >= 50 and est["a"] <= 61  # overshoot bounded by N-t

    # mergeability: sketch(all) == cms_merge(sketch(half1), sketch(half2))
    h1 = spark.createDataFrame(rows[:30], ["k"])
    h2 = spark.createDataFrame(rows[30:], ["k"])
    merged = SK.cms_merge(
        SK.count_min_sketch(h1, "k", width=8, depth=3),
        SK.count_min_sketch(h2, "k", width=8, depth=3),
    )
    whole = {(r["row"], r["slot"]): r["cnt"]
             for r in SK.count_min_sketch(df, "k", width=8, depth=3).collect()}
    got = {(r["row"], r["slot"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_cms_weighted_counts(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], ["k", "w"])
    sk = SK.count_min_sketch(df, "k", width=64, depth=4, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], ["k"])
    est = {r["k"]: r["est"] for r in
           SK.cms_estimate(sk, keys, "k", width=64, depth=4).collect()}
    assert est == {"a": 15, "b": 2}


def test_hll_merge_law_and_accuracy(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    n = 20_000
    df = spark.range(n).selectExpr("concat('key-', id) AS k")
    sk = SK.hll_sketch(df, "k", p=11)
    est = SK.hll_estimate(sk, p=11).collect()[0]
    # standard error 1.04/sqrt(2048) ~= 2.3%; allow 4 sigma
    assert abs(est["estimate"] - n) / n < 0.10
    assert est["raw_estimate"] > 0

    # merge law: sketch(A U B) == merge(sketch(A), sketch(B)) EXACTLY
    a = spark.range(0, 12_000).selectExpr("concat('key-', id) AS k")
    b = spark.range(8_000, n).selectExpr("concat('key-', id) AS k")  # overlap
    merged = SK.hll_merge(SK.hll_sketch(a, "k", p=11), SK.hll_sketch(b, "k", p=11))
    whole = {r["bucket"]: r["rho"] for r in sk.collect()}
    got = {r["bucket"]: r["rho"] for r in merged.collect()}
    assert got == whole


def test_hll_small_range_linear_counting(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    # 30 distinct keys, m=256 registers -> linear-counting branch; the
    # correction makes tiny cardinalities near-exact
    df = spark.createDataFrame([(f"u{i % 30}",) for i in range(500)], ["k"])
    est = SK.hll_estimate(SK.hll_sketch(df, "k", p=8), p=8).collect()[0]
    assert est["zero_registers"] >= 256 - 30
    assert abs(est["estimate"] - 30) <= 3
    # duplicates must not move the registers: set semantics
    once = spark.createDataFrame([(f"u{i}",) for i in range(30)], ["k"])
    r1 = {r["bucket"]: r["rho"] for r in SK.hll_sketch(df, "k", p=8).collect()}
    r2 = {r["bucket"]: r["rho"] for r in SK.hll_sketch(once, "k", p=8).collect()}
    assert r1 == r2


def test_hll_null_keys_ignored_and_bad_p(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    df = spark.createDataFrame([("a",), (None,), ("b",)], ["k"])
    assert SK.hll_sketch(df, "k", p=8).count() <= 2
    with pytest.raises(ValueError):
        SK.hll_sketch(df, "k", p=3)


def test_hll_intersect_inclusion_exclusion(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    # |A|=5000 (0..4999), |B|=5000 (3000..7999), |A∩B|=2000
    a = spark.range(0, 5000).selectExpr("concat('k', id) AS k")
    b = spark.range(3000, 8000).selectExpr("concat('k', id) AS k")
    sa = SK.hll_sketch(a, "k", p=12)
    sb = SK.hll_sketch(b, "k", p=12)
    r = SK.hll_intersect_estimate(sa, sb, p=12).collect()[0]
    assert abs(r["est_a"] - 5000) / 5000 < 0.1
    assert abs(r["est_union"] - 8000) / 8000 < 0.1
    # intersection carries the union's ABSOLUTE error: generous band
    assert abs(r["est_intersection"] - 2000) < 600
    # disjoint sets clamp at 0-ish
    c = spark.range(100000, 105000).selectExpr("concat('k', id) AS k")
    r2 = SK.hll_intersect_estimate(sa, SK.hll_sketch(c, "k", p=12), p=12)
    assert r2.collect()[0]["est_intersection"] < 600


def test_hll_grouped_matches_per_group_sketch(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    df = spark.range(6000).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS g",
        "concat('u', id % 500) AS k",
    )
    grouped = SK.hll_sketch_grouped(df, "g", "k", p=9)
    # per-group registers must equal the ungrouped sketch of that slice
    for g in ("a", "b"):
        solo = {r["bucket"]: r["rho"] for r in
                SK.hll_sketch(df.filter(f"g = '{g}'"), "k", p=9).collect()}
        got = {r["bucket"]: r["rho"] for r in
               grouped.filter(f"g = '{g}'").collect()}
        assert got == solo
    est = {r["g"]: r["estimate"] for r in
           SK.hll_estimate_grouped(grouped, "g", p=9).collect()}
    # gcd(3, 500) = 1, so BOTH groups cycle through all 500 residues
    assert abs(est["a"] - 500) / 500 < 0.15
    assert abs(est["b"] - 500) / 500 < 0.15


def test_hll_empty_sketch_estimates_zero(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    # an EMPTY register table (e.g. hll_state_estimate before the first
    # stream commit) is an empty set: linear counting with V=m must give
    # estimate 0.0, never NULL (SUM over zero rows is NULL without the
    # coalesce)
    df = spark.createDataFrame([("a",)], ["k"])
    empty = SK.hll_sketch(df.filter(F.lit(False)), "k", p=8)
    est = SK.hll_estimate(empty, p=8).collect()[0]
    assert est["zero_registers"] == 256
    assert est["estimate"] == 0.0
    assert est["raw_estimate"] is not None


def test_bpe_encode_sequences_and_oov_fallback(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        bpe as B,
    )

    corpus = spark.createDataFrame(
        [("low low lower",)], ["text"]
    )
    vocab = B.word_vocab(corpus)
    _, seg = B.bpe_train(vocab, n_merges=3)
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "newest"), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: list(r["bpe_tokens"])
           for r in B.bpe_encode(docs, seg).collect()}
    seg_rows = {r["word"]: list(r["syms"]) for r in seg.collect()}
    # in-vocab words use their trained segmentation, in document order
    assert got[1] == seg_rows["low"] + seg_rows["lower"]
    # OOV falls back to characters + </w>
    assert got[2] == list("newest") + ["</w>"]
    # NULL/empty text encode to empty sequences, not missing rows
    assert got[3] == [] and got[4] == []
    # counting path agrees with sequence lengths
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in B.bpe_segment(docs, seg).collect()}
    assert counts[1] == len(got[1]) and counts[2] == len(got[2])


# --- Bloom filter laws -------------------------------------------------------


def test_bloom_no_false_negatives_and_some_structure(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    keys = spark.createDataFrame([(i,) for i in range(40)], ["k"])
    ins = keys.filter("k % 2 = 0")
    bf = SK.bloom_filter(ins, "k", m_bits=300, k_hashes=3)
    probed = {r["k"]: r["maybe_present"]
              for r in SK.bloom_probe(keys, "k", bf, 300, 3).collect()}
    # definitional guarantee: every inserted key is flagged
    assert all(probed[i] for i in range(0, 40, 2))
    # at this sizing (20 keys, 300 bits, k=3) some absent key must be clean
    assert not all(probed[i] for i in range(1, 40, 2))
    # word table is bounded and positive (60-bit packing, no sign bit)
    words = bf.collect()
    assert len(words) <= 5 and all(r["bits"] > 0 for r in words)


def test_bloom_merge_law_exact(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    a = spark.createDataFrame([(i,) for i in range(15)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(10, 30)], ["k"])
    both = a.unionByName(b)
    merged = {(r["word_idx"], r["bits"]) for r in
              SK.bloom_merge(
                  SK.bloom_filter(a, "k", 240, 3),
                  SK.bloom_filter(b, "k", 240, 3),
              ).collect()}
    direct = {(r["word_idx"], r["bits"]) for r in
              SK.bloom_filter(both, "k", 240, 3).collect()}
    assert merged == direct  # OR is associative/idempotent: bit-identical


def test_bloom_null_keys_ignored_and_empty_probe(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    keys = spark.createDataFrame([(1,), (None,), (2,)], "k int")
    bf = SK.bloom_filter(keys, "k", m_bits=120, k_hashes=2)
    direct = SK.bloom_filter(keys.where("k IS NOT NULL"), "k", 120, 2)
    assert {tuple(r) for r in bf.collect()} == {tuple(r) for r in direct.collect()}
    # probing against an EMPTY filter: everything definitely absent
    empty = SK.bloom_filter(keys.where("k < 0"), "k", 120, 2)
    out = SK.bloom_probe(keys, "k", empty, 120, 2).collect()
    assert len(out) == 2 and not any(r["maybe_present"] for r in out)
    import pytest as _pt
    with _pt.raises(ValueError):
        SK.bloom_filter(keys, "k", m_bits=0)
    with _pt.raises(ValueError):
        SK.bloom_merge()


def test_bloom_semi_join_transparent_and_selective(spark, sf_dir):
    from pyspark.sql import functions as F

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        "c_acctbal > 9000"
    )
    out = SK.bloom_semi_join(
        orders, "o_custkey", cust, "c_custkey", m_bits=1024, k_hashes=3
    )
    plain = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "left_semi",
    )
    assert sorted(r["o_orderkey"] for r in out.collect()) == sorted(
        r["o_orderkey"] for r in plain.collect()
    )
    # the prefilter itself must drop most non-matching fact rows BEFORE
    # the join: rebuild just the filter stage and measure selectivity
    rows = SK.bloom_filter(cust, "c_custkey", 1024, 3).collect()
    words = [0] * 18
    for r in rows:
        words[int(r["word_idx"])] = int(r["bits"])
    key = F.col("o_custkey").cast("string")
    staged = orders.withColumn(
        "_bf_pos", F.array(*[SK._bloom_pos(key, j, 1024) for j in range(3)])
    ).withColumn("_bf_words", F.array(*[F.lit(w).cast("bigint") for w in words]))
    pre_n = staged.filter(
        F.expr(
            "forall(_bf_pos, p -> (shiftright(element_at(_bf_words, "
            "CAST(p div 60 AS INT) + 1), CAST(p % 60 AS INT)) & 1) = 1)"
        )
    ).count()
    exact_n = plain.count()
    assert exact_n <= pre_n < orders.count() * 0.7


def test_bloom_prefilter_superset_of_exact_match(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    big = spark.createDataFrame(
        [(i, f"k{i % 40}") for i in range(400)], "row_id bigint, k string"
    )
    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 40, 4)], "k string"
    )
    pre = SK.bloom_prefilter(big, "k", keys, "k", m_bits=256, k_hashes=3)
    exact = big.join(keys, "k", "left_semi")
    # no false negatives: every exact match survives the prefilter
    assert exact.join(pre, "row_id", "left_anti").count() == 0
    # and it actually filters (undersized m so FPs possible, but the
    # 90% non-member bulk cannot all collide)
    assert pre.count() < big.count()


def test_bloom_decontaminate_equals_plain(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        dedup as DD,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
            (3, "iota kappa lambda mu"),
            (4, "alpha beta gamma nu"),
            (5, None),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma xi"), (101, "iota kappa lambda rho")],
        "doc_id bigint, text string",
    )
    for mo in (1, 2):
        plain = DD.decontaminate(corpus, bench, shingle_n=3, min_overlap=mo)
        fast = DD.bloom_decontaminate(
            corpus, bench, shingle_n=3, min_overlap=mo, m_bits=1024
        )
        assert sorted(r["doc_id"] for r in plain.collect()) == sorted(
            r["doc_id"] for r in fast.collect()
        )
    # sanity: docs 1 and 4 share 'alpha beta gamma', doc 3 shares one
    kept = sorted(
        r["doc_id"]
        for r in DD.bloom_decontaminate(
            corpus, bench, shingle_n=3, m_bits=1024
        ).collect()
    )
    assert kept == [2, 5]
