"""Unigram-LM tokenizer training (operators/unigram.py, Kudo 2018):
DP optimality vs brute-force enumeration, full-trainer parity with an
independent pure-Python reference, determinism, coverage (the BPE
property-test precedent — no SQL oracle, data-dependent float model)."""

import math
import re

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    unigram as U,
)

CORPUS = [
    "the banana band banned bandanas",
    "a banana and a bandana in the band",
    "banned bands demand bananas",
    "the the the and and a a a",
]


def _all_segmentations(word, pieces, max_len):
    """Every segmentation of word into pieces (single chars always
    allowed via the UNK floor)."""
    if not word:
        yield []
        return
    for l in range(1, min(max_len, len(word)) + 1):
        head = word[:l]
        if head in pieces or l == 1:
            for rest in _all_segmentations(word[l:], pieces, max_len):
                yield [head] + rest


def _score(seg, logp):
    return sum(logp.get(p, U.UNK_LOGP) for p in seg)


def test_viterbi_optimal_vs_bruteforce():
    logp = {
        "ba": math.log(0.3), "na": math.log(0.3), "ban": math.log(0.1),
        "ana": math.log(0.2), "b": math.log(0.02), "a": math.log(0.05),
        "n": math.log(0.03),
    }
    for word in ["banana", "bananana", "banb", "xyz", "a", ""]:
        got = U._viterbi_py(word, logp, 3)
        assert "".join(got) == word
        if word:
            best = max(
                _score(s, logp)
                for s in _all_segmentations(word, set(logp), 3)
            )
            assert abs(_score(got, logp) - best) < 1e-12, word


def _py_train(texts, vocab_size, max_piece_len, seed_size, n_em_iters,
              prune_frac):
    """Independent driver-side reference: same published algorithm,
    no Spark — word counts, substring seed, hard-EM loop, count prune."""
    wc = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
            wc[w] = wc.get(w, 0) + 1
    sub = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i:i + l]
                sub[p] = sub.get(p, 0) + n
    multi = sorted(
        (p for p in sub if len(p) >= 2), key=lambda p: (-sub[p], p)
    )[:seed_size]
    pieces = multi + [p for p in sub if len(p) == 1]
    total0 = sum(sub[p] for p in pieces)
    logp = {p: math.log(sub[p] / total0) for p in pieces}
    counts = {p: sub[p] for p in pieces}

    def estep(lp):
        c = {}
        for w, n in wc.items():
            for p in U._viterbi_py(w, lp, max_piece_len):
                c[p] = c.get(p, 0) + n
        return c

    def mstep(c, inv):
        total = sum(c.values())
        out = {}
        for p in inv:
            k = c.get(p, 0)
            if k > 0:
                out[p] = math.log(k / total)
            elif len(p) == 1:
                out[p] = math.log(0.5 / total)
        return out

    while True:
        for _ in range(n_em_iters):
            counts = estep(logp)
            logp = mstep(counts, list(logp))
        m = [p for p in logp if len(p) >= 2]
        ch = [p for p in logp if len(p) == 1]
        if len(m) + len(ch) <= vocab_size or not m:
            break
        target = max(
            len(m) - max(int(len(m) * prune_frac), 1),
            vocab_size - len(ch), 0,
        )
        if target >= len(m):
            break
        keep = set(
            sorted(m, key=lambda p: (-counts.get(p, 0), p))[:target]
        )
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in keep}
    return {p: (counts.get(p, 0), logp[p]) for p in logp}


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id BIGINT, text STRING"
    )
    params = dict(vocab_size=20, max_piece_len=3, seed_size=30,
                  n_em_iters=2, prune_frac=0.25)
    got = {
        r["piece"]: (r["cnt"], r["logprob"])
        for r in U.unigram_train(U.word_counts(df), **params).collect()
    }
    want = _py_train(CORPUS, **params)
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0], p          # exact integer counts
        assert abs(got[p][1] - want[p][1]) < 1e-12, p


def test_train_deterministic_and_keeps_chars(spark):
    df = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id BIGINT, text STRING"
    )
    v = U.word_counts(df)
    m1 = sorted(map(tuple, U.unigram_train(v, vocab_size=15).collect()))
    m2 = sorted(map(tuple, U.unigram_train(v, vocab_size=15).collect()))
    assert m1 == m2
    pieces = {p for p, _, _ in m1}
    corpus_chars = set("".join(re.findall(r"[a-z0-9]+",
                                          " ".join(CORPUS).lower())))
    assert corpus_chars <= pieces  # coverage: every char survives


def test_encode_roundtrip_and_oov(spark):
    train = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id BIGINT, text STRING"
    )
    model = U.unigram_train(U.word_counts(train), vocab_size=25,
                            max_piece_len=3)
    apply_df = spark.createDataFrame(
        [(1, "banana band"), (2, "zqzq 99 banana"), (3, None), (4, "")],
        "doc_id BIGINT, text STRING",
    )
    rows = {r["doc_id"]: r for r in
            U.unigram_encode(apply_df, model).collect()}
    for doc_id, text in [(1, "banana band"), (2, "zqzq 99 banana")]:
        toks = list(rows[doc_id]["unigram_tokens"])
        joined = "".join(re.findall(r"[a-z0-9]+", text))
        assert "".join(toks) == joined          # lossless coverage
        assert rows[doc_id]["n_pieces"] == len(toks)
    assert list(rows[3]["unigram_tokens"]) == []
    assert list(rows[4]["unigram_tokens"]) == []


def test_learns_dominant_piece(spark):
    df = spark.createDataFrame(
        [(i, "abcd " * 20) for i in range(3)] + [(9, "x y z")],
        "doc_id BIGINT, text STRING",
    )
    model = U.unigram_train(U.word_counts(df), vocab_size=10,
                            max_piece_len=4)
    pieces = {r["piece"]: r["cnt"] for r in model.collect()}
    assert "abcd" in pieces and pieces["abcd"] == 60
    enc = U.unigram_encode(
        spark.createDataFrame([(1, "abcdabcd")], "doc_id BIGINT, text STRING"),
        model,
    ).collect()[0]
    assert list(enc["unigram_tokens"]) == ["abcd", "abcd"]


def test_seed_counts_overlapping_substrings(spark):
    df = spark.createDataFrame([("abab", 2)], "word STRING, n BIGINT")
    seed = {r["piece"]: r["cnt"]
            for r in U.seed_pieces(df, max_piece_len=3, seed_size=100).collect()}
    # "ab" occurs at offsets 0 and 2 -> 2 per word x count 2 = 4
    assert seed["ab"] == 4 and seed["ba"] == 2
    assert seed["a"] == 4 and seed["b"] == 4
    assert seed["aba"] == 2 and seed["bab"] == 2
