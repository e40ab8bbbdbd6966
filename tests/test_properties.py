"""Property-based tests (hypothesis): the Spark operators must agree with
pure-Python reference implementations on randomized inputs. Exceeds the
reference's test strategy (SURVEY.md §5: no property tests there)."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark import schemas as S
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    validation as V,
)

# --- python reference implementations ----------------------------------------

def py_required_numeric_invalid(v):
    return v is None or v == "" or re.search(r"[^0-9]", v) is not None


def py_member_of_invalid(v, values):
    return v is None or v not in values


def py_max_length_invalid(v, n):
    return v is not None and len(v) > n


def py_range_invalid(v, lo, hi):
    if v is None:
        return False
    try:
        x = int(v)
    except ValueError:
        return False  # try_cast null → NULL comparison → passes
    return x < lo or x > hi


value_strategy = st.one_of(
    st.none(),
    st.just(""),
    st.from_regex(r"[0-9]{1,12}", fullmatch=True),
    st.from_regex(r"[0-9a-z#%]{1,16}", fullmatch=True),
    st.just("2020-08-06 00:00:00"),
)

row_strategy = st.tuples(
    st.sampled_from(["018", "019", "020", "021"]),  # opco_id
    value_strategy,  # supc
    value_strategy,  # customer_id
    st.one_of(st.none(), st.from_regex(r"[0-9]{1,2}", fullmatch=True), st.just("x")),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row_strategy, min_size=1, max_size=30))
def test_validation_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        rows, "opco_id string, supc string, customer_id string, price_zone string"
    )
    active = ["019", "020"]
    rules = [
        V.Rule("active", "opco_id", "member_of", {"values": active}),
        V.Rule("supc_num", "supc", "required_numeric"),
        V.Rule("supc_len", "supc", "max_length", {"n": S.SUPC_LENGTH}),
        V.Rule("cust_num", "customer_id", "required_numeric"),
        V.Rule(
            "pz_range",
            "price_zone",
            "expr",
            {
                "condition": (F.col("price_zone").try_cast("int") < 1)
                | (F.col("price_zone").try_cast("int") > 5)
            },
        ),
    ]
    _, report = V.validate(df, rules, "opco_id")

    expected: dict[str, set] = {r.name: set() for r in rules}
    for opco, supc, cust, pz in rows:
        if py_member_of_invalid(opco, active):
            expected["active"].add(opco)
        if py_required_numeric_invalid(supc):
            expected["supc_num"].add(opco)
        if py_max_length_invalid(supc, S.SUPC_LENGTH):
            expected["supc_len"].add(opco)
        if py_required_numeric_invalid(cust):
            expected["cust_num"].add(opco)
        if pz is not None and re.fullmatch(r"[0-9]{1,2}", pz) and not 1 <= int(pz) <= 5:
            expected["pz_range"].add(opco)

    assert report.per_rule_invalid_groups == expected
    exp_invalid = set().union(*expected.values()) if expected else set()
    assert report.invalid_groups == exp_invalid
    exp_valid = sum(1 for r in rows if r[0] not in exp_invalid)
    assert report.valid_count == exp_valid


def py_shingles(text, n=3):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if len(toks) <= n - 1:
        return {" ".join(toks[:n])}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="abc XY.12", min_size=0, max_size=60), min_size=2, max_size=8
    )
)
def test_jaccard_matches_python_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.jaccard_pairs(df, threshold=0.0).collect()
    }
    for i, ta in rows:
        for j, tb in rows:
            if i >= j:
                continue
            sa, sb = py_shingles(ta), py_shingles(tb)
            inter = len(sa & sb)
            expected = inter / len(sa | sb) if inter else None
            if expected is None:
                assert (i, j) not in got  # no shared shingle → no pair row
            else:
                assert got[(i, j)] == pytest.approx(round(expected, 6), abs=1e-9)


# --- BPE merge fold vs Python reference --------------------------------------


def _py_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_sym = st.sampled_from(["a", "b", "ab", "c", "</w>"])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    syms=st.lists(_sym, min_size=0, max_size=12),
    pair=st.tuples(_sym, _sym),
)
def test_bpe_merge_fold_matches_python_reference(spark, syms, pair):
    from pyspark.sql import functions as F

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        bpe as B,
    )

    a, b = pair
    df = spark.createDataFrame([(syms,)], "syms: array<string>")
    got = df.select(B._merge_pair(F.col("syms"), a, b).alias("m")).first()["m"]
    assert list(got) == _py_merge(syms, a, b)


# --- end-to-end BPE training vs pure-Python Sennrich reference ---------------


def _py_bpe_train(word_counts, n_merges):
    """Canonical Sennrich BPE on a (word -> count) table; ties break on
    count desc then lexicographically smallest pair — the exact
    determinism contract of bpe.bpe_train."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        vocab = {w: _py_merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


_word = st.from_regex(r"[ab]{1,4}", fullmatch=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(st.lists(_word, min_size=1, max_size=6), min_size=1,
                     max_size=5))
def test_bpe_train_matches_python_reference(spark, docs):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        bpe as B,
    )

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    vocab = B.word_vocab(df)
    merges, seg = B.bpe_train(vocab, n_merges=4)

    counts = {}
    for ws in docs:
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    py_merges, py_vocab = _py_bpe_train(counts, 4)
    assert merges == py_merges
    got = {r["word"]: list(r["syms"]) for r in seg.collect()}
    assert got == py_vocab


# --- sequence packing vs pure-Python greedy reference ------------------------


def _py_pack(rows, budget):
    """Greedy sequential packer: rows (pos, n_tokens) in pos order; a
    pack closes when the next row would exceed the budget; an oversized
    row gets its own pack."""
    pack_id, acc, out = 0, 0, {}
    for pos, t in sorted(rows):
        if acc > 0 and acc + t > budget:
            pack_id += 1
            acc = 0
        acc += t
        out[pos] = pack_id
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=12), min_size=1,
                    max_size=16),
    budget=st.integers(min_value=1, max_value=20),
    n_shards=st.integers(min_value=1, max_value=3),
)
def test_pack_sequences_matches_python_reference(spark, tokens, budget,
                                                 n_shards):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sampling as SP,
    )

    rows = [(i % n_shards, i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, ["shard", "pos", "n_tokens"])
    got = {
        (r["shard"], r["pos"]): r["pack_id"]
        for r in SP.pack_sequences(df, budget).collect()
    }
    want = {}
    for s in range(n_shards):
        shard_rows = [(p, t) for sh, p, t in rows if sh == s]
        for pos, pid in _py_pack(shard_rows, budget).items():
            want[(s, pos)] = pid
    assert got == want


# --- HLL / CMS sketches vs pure-Python references ----------------------------
# A third, independent implementation of the md5 parity-kit recipes: the
# Spark sketch and the DuckDB oracle could in principle share a
# misunderstanding; hashlib-based Python cannot.

import hashlib


def _md5_60bit(prefix, key):
    return int(hashlib.md5((prefix + key).encode()).hexdigest()[:15], 16)


def _py_hll_registers(keys, p=8):
    m, bits = 1 << p, 60 - p
    regs = {}
    for k in keys:
        if k is None:
            continue
        h = _md5_60bit("hll|", str(k))
        bucket, rest = h % m, h >> p
        rho = bits + 1 if rest == 0 else bits - rest.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_cms_grid(keys, width=64, depth=3):
    grid = {}
    for k in keys:
        if k is None:
            continue
        for r in range(depth):
            slot = _md5_60bit(f"cms{r}|", str(k)) % width
            grid[(r, slot)] = grid.get((r, slot), 0) + 1
    return grid


_key = st.one_of(st.none(), st.from_regex(r"[a-z0-9]{1,8}", fullmatch=True))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(_key, min_size=0, max_size=40))
def test_hll_registers_match_python_reference(spark, keys):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k: string")
    got = {r["bucket"]: r["rho"]
           for r in SK.hll_sketch(df, "k", p=8).collect()}
    assert got == _py_hll_registers(keys, p=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(_key, min_size=0, max_size=40))
def test_cms_grid_matches_python_reference(spark, keys):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k: string")
    got = {(r["row"], r["slot"]): r["cnt"]
           for r in SK.count_min_sketch(df, "k", width=64, depth=3).collect()}
    assert got == _py_cms_grid(keys, width=64, depth=3)


# --- round-8 operators: URL canonicalization + ExactSubstr --------------------

url_strategy = st.one_of(
    st.from_regex(
        r"(https?|ftp)://([a-z0-9]{1,6}(\.[a-z0-9]{1,6}){0,3})(:[0-9]{1,5})?"
        r"(/[a-z0-9./]{0,12})?(\?[a-z0-9=&_]{0,20})?(#[a-z0-9]{0,6})?",
        fullmatch=True,
    ),
    st.from_regex(r"[ a-z0-9:/?#.]{0,20}", fullmatch=True),  # junk
    st.none(),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(url_strategy, min_size=1, max_size=12))
def test_canonical_url_is_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): the canonical form must
    be a fixed point (re-crawling a canonicalized URL can't produce a
    different dedup key)."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        web as W,
    )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id BIGINT, url STRING"
    )
    once = df.select(
        "doc_id", W.canonical_url("url").alias("c1")
    )
    twice = once.select(
        "doc_id", "c1", W.canonical_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


token_strategy = st.from_regex(r"[a-z]{1,4}", fullmatch=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(token_strategy, min_size=0, max_size=40), min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=8),
)
def test_exactsubstr_conservation_and_subsequence(spark, docs, L):
    """Invariants on random corpora: kept + removed == total tokens per
    doc; the rewritten text is a SUBSEQUENCE of the original tokens;
    and every document whose tokens are corpus-unique is untouched."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r["doc_id"]: r
        for r in D.exactsubstr_rewrite(df, min_tokens=L).collect()
    }
    assert len(out) == len(docs)
    for i, toks in enumerate(docs):
        r = out[i]
        kept = r["text_dedup"].split() if r["text_dedup"] else []
        assert r["n_tokens"] == len(toks)
        assert len(kept) + r["n_removed"] == len(toks)
        # subsequence check
        it = iter(toks)
        assert all(any(k == t for t in it) for k in kept), (toks, kept)


def py_exactsubstr_rewrite(docs, L):
    """Pure-Python reference of dedup.exactsubstr_rewrite: stride-1
    L-gram first-site protection + coverage removal."""
    toks = {i: t for i, t in docs}
    sites = {}  # gram -> list[(doc, pos)]
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - L + 1):
            sites.setdefault(tuple(t[p:p + L]), []).append((i, p))
    removal, protect = {}, {}
    for occ in sites.values():
        if len(occ) < 2:
            continue
        first = min(occ)
        for (d, p) in occ:
            target = protect if (d, p) == first else removal
            target.setdefault(d, set()).update(range(p, p + L))
    out = {}
    for i in sorted(toks):
        rem = removal.get(i, set()) - protect.get(i, set())
        kept = [w for p, w in enumerate(toks[i]) if p not in rem]
        out[i] = (" ".join(kept), len(toks[i]), len(rem))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0,
                 max_size=30),
        min_size=1, max_size=5,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_exactsubstr_matches_python_reference(spark, docs, L):
    """Exact output equality with the pure-Python reference on random
    small-alphabet corpora (small alphabet forces dense duplication —
    overlapping spans, self-repeats, protection collisions)."""
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_removed"])
        for r in D.exactsubstr_rewrite(df, min_tokens=L).collect()
    }
    want = py_exactsubstr_rewrite(list(enumerate(docs)), L)
    assert got == want


def py_ewma_fixed(vals, num=3, den=10, scale=2):
    s = None
    for v in vals:
        xi = int(round(v * (10 ** scale)))  # inputs chosen off .5 boundaries
        if s is None:
            s = xi
        else:
            s = (2 * (num * xi + (den - num) * s) + den) // (2 * den)
    return None if s is None else round(s / (10 ** scale), 6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.integers(min_value=0, max_value=99999).map(lambda c: c / 100.0),
    min_size=1, max_size=25,
))
def test_ewma_matches_python_reference(spark, vals):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.timeseries import (
        ewma_last,
    )

    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k BIGINT, o BIGint, v DOUBLE"
    )
    r = ewma_last(df, "k", "o", "v").collect()[0]
    assert r["n_points"] == len(vals)
    assert r["ewma"] == py_ewma_fixed(vals)


def py_registrable_domain(host, multi):
    parts = host.split(".")
    if len(parts) <= 1:
        return host
    last2 = ".".join(parts[-2:])
    if len(parts) >= 3 and last2 in multi:
        return ".".join(parts[-3:])
    return last2


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.from_regex(r"[a-z0-9]{1,5}(\.[a-z0-9]{1,5}){0,4}", fullmatch=True)
    | st.sampled_from(["a.co.uk", "x.y.github.io", "co.uk", "localhost"]),
    min_size=1, max_size=15,
))
def test_registrable_domain_matches_python_reference(spark, hosts):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        web as W,
    )

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id BIGINT, h STRING"
    )
    got = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id", W.registrable_domain("h").alias("d")
        ).collect()
    }
    for i, h in enumerate(hosts):
        assert got[i] == py_registrable_domain(
            h, set(W.MULTI_LABEL_SUFFIXES)
        ), (h, got[i])


# --- deterministic-compaction KLL (operators/kll.py) --------------------------

def py_kll_single_block(vals, k):
    """Exact mirror of kll._compact_levels over ONE canonical block:
    levels of (level -> multiset), alternating pair survivor (index
    i % 2 of sorted pair i), odd max stays, budget += 2^level per
    compaction."""
    levels = [list(vals)]
    budget = 0
    lvl = 0
    while lvl < len(levels):
        buf = sorted(levels[lvl])
        if len(buf) > k:
            if len(buf) % 2:
                leftover, body = [buf[-1]], buf[:-1]
            else:
                leftover, body = [], buf
            promoted = [body[2 * i + (i % 2)] for i in range(len(body) // 2)]
            levels[lvl] = leftover
            if lvl + 1 == len(levels):
                levels.append(promoted)
            else:
                levels[lvl + 1] = levels[lvl + 1] + promoted
            budget += 1 << lvl
        lvl += 1
    return levels, budget


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.integers(min_value=-10_000, max_value=10_000).map(float),
        min_size=1, max_size=250,
    ),
    k=st.sampled_from([4, 8, 16]),
)
def test_kll_single_block_matches_python_reference(spark, vals, k):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        kll as K,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id BIGINT, v DOUBLE"
    )
    rows = K.kll_sketch(df, "v", k=k, n_blocks=1, id_col="id").collect()
    ref_levels, ref_budget = py_kll_single_block(vals, k)
    got = sorted((r["level"], r["val"]) for r in rows)
    want = sorted(
        (lvl, v) for lvl, buf in enumerate(ref_levels) for v in buf
    )
    assert got == want
    assert all(r["err_budget"] == ref_budget and r["n"] == len(vals) for r in rows)
    # invariant: every probe's est rank is within the budget of truth
    state = [(r["val"], 1 << r["level"]) for r in rows]
    sv = sorted(vals)
    for x in {v for v, _ in state} | {sv[0], sv[-1], sv[len(sv) // 2]}:
        est = sum(w for v, w in state if v < x)
        true = sum(1 for v in vals if v < x)
        assert abs(est - true) <= ref_budget


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    keys=st.lists(st.integers(min_value=0, max_value=6), min_size=1,
                  max_size=120),
    hot=st.sets(st.integers(min_value=0, max_value=8), max_size=4),
)
def test_hot_split_join_identity_property(spark, keys, hot):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skew import (
        hot_split_join,
    )

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k BIGINT, lv BIGINT"
    )
    right = spark.createDataFrame(
        [(k, k * 7) for k in range(0, 7, 2)], "k BIGINT, rv BIGINT"
    )
    plain = sorted(map(tuple, left.join(right, "k", "inner").collect()))
    split = sorted(
        map(tuple, hot_split_join(left, right, "k", hot_keys=list(hot)).collect())
    )
    assert split == plain
