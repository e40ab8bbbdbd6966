"""Streaming HLL cardinality state (streaming/sketch_state.py): live
register maintenance across micro-batches, batch↔streaming register
parity, replay idempotency of the MAX merge, and compaction's promote
protocol."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
    hll_estimate,
    hll_sketch,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
    compact_registers,
    hll_state_estimate,
    make_hll_batch_fn,
    read_hll_state,
    streaming_hll,
)

EV_SCHEMA = "event_id BIGINT, user_id BIGINT"


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="streamhll-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, lo, hi, mod):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"), (F.col("id") % mod).alias("user_id")
    )


def test_streaming_hll_matches_batch_sketch(spark, workdir, tmp_path):
    src = str(tmp_path / "src")
    _events(spark, 0, 500, 40).coalesce(1).write.mode("append").parquet(src)
    _events(spark, 500, 1000, 70).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_hll(stream, workdir, "user_id", p=10)
    q.awaitTermination(180)

    whole = _events(spark, 0, 500, 40).unionByName(_events(spark, 500, 1000, 70))
    batch = {r["bucket"]: r["rho"]
             for r in hll_sketch(whole, "user_id", p=10).collect()}
    streamed = {r["bucket"]: r["rho"]
                for r in read_hll_state(spark, workdir).collect()}
    assert streamed == batch

    est = hll_state_estimate(spark, workdir, p=10).collect()[0]
    # true distinct: 0..69 = 70 users; linear-counting regime at p=10
    assert abs(est["estimate"] - 70) <= 10


def test_hll_batch_fn_replay_idempotent(spark, workdir):
    fn = make_hll_batch_fn(workdir, "user_id", p=9)
    b0 = _events(spark, 0, 300, 25)
    b1 = _events(spark, 300, 600, 55)
    fn(b0, 0)
    fn(b1, 1)
    before = sorted(read_hll_state(spark, workdir).collect())
    fn(b0, 0)  # crash/replay: same epoch re-delivered
    fn(b1, 1)
    after = sorted(read_hll_state(spark, workdir).collect())
    assert after == before


def test_compact_registers_preserves_state(spark, workdir):
    fn = make_hll_batch_fn(workdir, "user_id", p=9)
    for i in range(4):
        fn(_events(spark, i * 100, (i + 1) * 100, 17 + i), i)
    before = sorted(read_hll_state(spark, workdir).collect())
    removed = compact_registers(spark, workdir)
    assert removed == 4
    after = sorted(read_hll_state(spark, workdir).collect())
    assert after == before
    # second compaction folds {compact} ∪ nothing → no-op
    assert compact_registers(spark, workdir) == 0
    # new batches after compaction still merge in
    fn(_events(spark, 1000, 1100, 97), 99)
    grown = read_hll_state(spark, workdir)
    est = hll_estimate(grown, p=9).collect()[0]
    assert est["estimate"] > hll_estimate(
        spark.createDataFrame(
            [(b["bucket"], b["rho"]) for b in before], "bucket bigint, rho int"
        ),
        p=9,
    ).collect()[0]["estimate"]


def test_read_hll_state_empty_dir(spark, workdir):
    assert read_hll_state(spark, workdir).count() == 0
    assert compact_registers(spark, workdir) == 0


def test_streaming_cms_matches_batch_and_replay(spark, workdir, tmp_path):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_cms_batch_fn,
        read_cms_state,
        streaming_cms,
    )

    src = str(tmp_path / "csrc")
    b0 = _events(spark, 0, 400, 7)
    b1 = _events(spark, 400, 800, 13)
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_cms(stream, workdir, "user_id", width=64, depth=3).awaitTermination(180)

    whole = b0.unionByName(b1)
    batch = {(r["row"], r["slot"]): r["cnt"] for r in
             count_min_sketch(whole, "user_id", 64, 3).collect()}
    streamed = {(r["row"], r["slot"]): r["cnt"] for r in
                read_cms_state(spark, workdir).collect()}
    assert streamed == batch

    # SUM-merge is not idempotent; the epoch-dir layout must be:
    # replaying an epoch leaves the merged grid unchanged
    fn = make_cms_batch_fn(workdir, "user_id", 64, 3)
    fn(b0, 0)
    again = {(r["row"], r["slot"]): r["cnt"] for r in
             read_cms_state(spark, workdir).collect()}
    assert again == batch

    # estimates over the merged state never undercount the true counts
    keys = spark.createDataFrame([(0,), (5,)], ["user_id"])
    est = {r["user_id"]: r["est"] for r in
           cms_estimate(read_cms_state(spark, workdir), keys, "user_id",
                        64, 3).collect()}
    true0 = whole.filter(F.col("user_id") == 0).count()
    assert est[0] >= true0


def test_streaming_bloom_matches_batch_and_replay(spark, workdir, tmp_path):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
        bloom_filter,
        bloom_probe,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_bloom_batch_fn,
        read_bloom_state,
        streaming_bloom,
    )

    src = str(tmp_path / "bsrc")
    b0 = _events(spark, 0, 300, 7)
    b1 = _events(spark, 300, 600, 13)
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_bloom(stream, workdir, "user_id", m_bits=240, k_hashes=3
                    ).awaitTermination(180)

    whole = b0.unionByName(b1)
    batch = {(r["word_idx"], r["bits"]) for r in
             bloom_filter(whole, "user_id", 240, 3).collect()}
    streamed = {(r["word_idx"], r["bits"]) for r in
                read_bloom_state(spark, workdir).collect()}
    assert streamed == batch  # OR merge across epochs ≡ one batch build

    # doubly replay-safe: layout (overwrite own dir) AND OR idempotency
    fn = make_bloom_batch_fn(workdir, "user_id", 240, 3)
    fn(b0, 0)
    again = {(r["word_idx"], r["bits"]) for r in
             read_bloom_state(spark, workdir).collect()}
    assert again == batch

    # live state serves probes with no false negatives
    seen = spark.createDataFrame([(i,) for i in range(13)], ["user_id"])
    probed = bloom_probe(seen, "user_id",
                         read_bloom_state(spark, workdir), 240, 3)
    assert all(r["maybe_present"] for r in probed.collect())


def test_read_bloom_state_empty_is_valid(spark, workdir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        read_bloom_state,
    )

    df = read_bloom_state(spark, workdir)
    assert df.count() == 0
    assert df.columns == ["word_idx", "bits"]


def test_bottomk_merge_law_estimate_and_small_exact(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
        bottomk_estimate,
        bottomk_merge,
        bottomk_sketch,
    )

    a = _events(spark, 0, 500, 10**9)
    b = _events(spark, 300, 900, 10**9)
    k = 16
    direct = bottomk_sketch(a.unionByName(b), "user_id", k)
    merged = bottomk_merge(
        bottomk_sketch(a, "user_id", k),
        bottomk_sketch(b, "user_id", k),
        k=k,
    )
    key = lambda r: (r["h"], r["key"])
    assert sorted(map(key, direct.collect())) == sorted(
        map(key, merged.collect())
    )
    # estimator: 900 distinct users, k=16 -> within a loose 3-sigma-ish
    # band (sigma ~ n/sqrt(k) ~ 225)
    est = bottomk_estimate(direct, k=k).collect()[0]
    assert est["k_used"] == k
    assert 200 <= est["estimate"] <= 2500
    # fewer distinct keys than k -> exact count
    tiny = bottomk_sketch(_events(spark, 0, 5, 10**9), "user_id", k)
    est2 = bottomk_estimate(tiny, k=k).collect()[0]
    assert est2["k_used"] == 5 and est2["estimate"] == 5.0


def test_streaming_bottomk_matches_batch_and_replay(spark, workdir, tmp_path):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
        bottomk_sketch,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_bottomk_batch_fn,
        read_bottomk_state,
        streaming_bottomk,
    )

    src = str(tmp_path / "bksrc")
    b0 = _events(spark, 0, 400, 10**9)
    b1 = _events(spark, 200, 700, 10**9)
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_bottomk(stream, workdir, "user_id", k=16).awaitTermination(180)

    key = lambda r: (r["h"], r["key"])
    batch = sorted(
        map(key, bottomk_sketch(b0.unionByName(b1), "user_id", 16).collect())
    )
    streamed = sorted(map(key, read_bottomk_state(spark, workdir, 16).collect()))
    assert streamed == batch
    # replay idempotence: both via own-dir overwrite AND the re-take-k law
    make_bottomk_batch_fn(workdir, "user_id", 16)(b0, 0)
    again = sorted(map(key, read_bottomk_state(spark, workdir, 16).collect()))
    assert again == batch


def test_priority_sample_merge_law_and_exact_below_k(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
        priority_estimates,
        priority_merge,
        priority_sample,
    )

    wts = spark.range(0, 300).selectExpr(
        "CAST(id AS STRING) AS key", "CAST(1 + id % 7 AS DOUBLE) AS w"
    )
    k = 12
    direct = priority_sample(wts, "key", "w", k)
    merged = priority_merge(
        priority_sample(wts.filter("id < 180"), "key", "w", k),
        priority_sample(wts.filter("id >= 180"), "key", "w", k),
        k=k,
    )
    rk = lambda r: (r["q"], r["key"], r["w"])
    assert sorted(map(rk, direct.collect())) == sorted(
        map(rk, merged.collect())
    )
    # estimator sanity: total-weight estimate within a loose band
    est = priority_estimates(direct, k)
    total_hat = sum(r["adj_weight"] for r in est.collect())
    total = 300 * 4.0  # mean weight (1+..+7)/7 = 4
    assert 0.3 * total <= total_hat <= 3.0 * total
    # fewer keys than k: tau = 0, estimates are the exact weights
    tiny = priority_sample(wts.filter("id < 5"), "key", "w", k)
    ests = {r["key"]: r["adj_weight"]
            for r in priority_estimates(tiny, k).collect()}
    assert ests == {str(i): float(1 + i % 7) for i in range(5)}


def test_priority_sample_guards_and_filters(spark):
    import pytest as _pytest

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
        priority_sample,
    )

    wts = spark.createDataFrame(
        [("a", 2.0), ("b", 0.0), (None, 5.0), ("c", -1.0)],
        "key string, w double",
    )
    kept = {r["key"] for r in priority_sample(wts, "key", "w", 8).collect()}
    assert kept == {"a"}  # zero/negative weights and NULL keys dropped
    with _pytest.raises(ValueError, match="k must be"):
        priority_sample(wts, "key", "w", 0)


def test_bottomk_value_sample_merge_law_and_nulls(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    rows_a = [(i, float(i * 10)) for i in range(40)] + [(None, 1.0), (99, None)]
    rows_b = [(i, float(i * 10)) for i in range(30, 80)]
    a = spark.createDataFrame(rows_a, "k BIGINT, v DOUBLE")
    b = spark.createDataFrame(rows_b, "k BIGINT, v DOUBLE")
    sa = SK.bottomk_value_sample(a, "k", "v", k=16)
    sb = SK.bottomk_value_sample(b, "k", "v", k=16)
    merged = sorted(map(tuple, SK.bottomk_value_merge(sa, sb, k=16).collect()))
    direct = sorted(
        map(
            tuple,
            SK.bottomk_value_sample(a.unionByName(b), "k", "v", k=16).collect(),
        )
    )
    assert merged == direct
    # NULL key / NULL value rows never enter the sample
    keys = {r.key for r in sa.collect()}
    assert "99" not in keys and None not in keys


def test_sampled_quantile_report_discrete_ranks(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    # full data 1..8; a "sample" that IS the full table makes the
    # discrete rank arithmetic hand-checkable: est == exact everywhere
    full = spark.createDataFrame([(i, float(i)) for i in range(1, 9)],
                                 "k BIGINT, v DOUBLE")
    samp = SK.bottomk_value_sample(full, "k", "v", k=100)
    rep = {
        (r.q_num, r.q_den): r
        for r in SK.sampled_quantile_report(
            samp, full, "v", quantiles=((1, 4), (1, 2), (3, 4), (1, 1))
        ).collect()
    }
    # ceil(8*q) -> ranks 2, 4, 6, 8 -> values 2, 4, 6, 8
    assert rep[(1, 4)].exact == 2.0 and rep[(1, 2)].exact == 4.0
    assert rep[(3, 4)].exact == 6.0 and rep[(1, 1)].exact == 8.0
    for r in rep.values():
        assert r.est == r.exact and r.abs_err == 0.0 and r.n_sample == 8


def test_sampled_quantile_report_validates_quantiles(spark):
    import pytest as _pt

    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    df = spark.createDataFrame([(1, 1.0)], "k BIGINT, v DOUBLE")
    s = SK.bottomk_value_sample(df, "k", "v", k=4)
    with _pt.raises(ValueError, match="rationals"):
        SK.sampled_quantile_report(s, df, "v", quantiles=((3, 2),))
    with _pt.raises(ValueError):
        SK.bottomk_value_sample(df, "k", "v", k=0)


def test_grouped_value_sample_merge_law(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    rows_a = [("g1", i, float(i)) for i in range(30)] + [
        ("g2", i, float(i * 2)) for i in range(10)
    ]
    rows_b = [("g1", i, float(i)) for i in range(20, 60)] + [
        ("g2", i, float(i * 2)) for i in range(5, 30)
    ]
    a = spark.createDataFrame(rows_a, "g STRING, k BIGINT, v DOUBLE")
    b = spark.createDataFrame(rows_b, "g STRING, k BIGINT, v DOUBLE")
    sa = SK.bottomk_value_sample_grouped(a, "g", "k", "v", k=8)
    sb = SK.bottomk_value_sample_grouped(b, "g", "k", "v", k=8)
    merged = sorted(
        map(tuple, SK.bottomk_value_merge_grouped(sa, sb, group_col="g", k=8).collect())
    )
    direct = sorted(
        map(
            tuple,
            SK.bottomk_value_sample_grouped(
                a.unionByName(b), "g", "k", "v", k=8
            ).collect(),
        )
    )
    assert merged == direct
    # every group capped at k
    from collections import Counter

    assert all(c <= 8 for c in Counter(t[0] for t in merged).values())


def test_grouped_quantile_report_per_group_exact(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    # full-table "sample" per group -> est == exact; groups of different
    # sizes exercise the per-group rank arithmetic
    rows = [("a", i, float(i)) for i in range(1, 5)] + [
        ("b", i, float(10 * i)) for i in range(1, 11)
    ]
    full = spark.createDataFrame(rows, "g STRING, k BIGINT, v DOUBLE")
    samp = SK.bottomk_value_sample_grouped(full, "g", "k", "v", k=100)
    rep = {
        (r.g, r.q_num, r.q_den): r
        for r in SK.grouped_quantile_report(
            samp, full, "g", "v", quantiles=((1, 2), (3, 4))
        ).collect()
    }
    # group a (n=4): ceil(4*1/2)=2 -> 2.0 ; ceil(4*3/4)=3 -> 3.0
    assert rep[("a", 1, 2)].exact == 2.0 and rep[("a", 3, 4)].exact == 3.0
    # group b (n=10): ranks 5 and 8 -> 50.0, 80.0
    assert rep[("b", 1, 2)].exact == 50.0 and rep[("b", 3, 4)].exact == 80.0
    for r in rep.values():
        assert r.est == r.exact and r.abs_err == 0.0


def test_streaming_bottomk_values_matches_batch_and_replay(spark, workdir, tmp_path):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.sketches import (
        bottomk_value_sample,
        sampled_quantile_report,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_bottomk_values_batch_fn,
        read_bottomk_values_state,
        streaming_bottomk_values,
    )

    src = str(tmp_path / "bkvsrc")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    b0, b1 = mk(0, 400), mk(200, 700)
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_bottomk_values(
        stream, workdir, "event_id", "value", k=16
    ).awaitTermination(180)

    key = lambda r: (r["h"], r["key"], r["val"])
    union = b0.unionByName(b1)
    batch = sorted(
        map(key, bottomk_value_sample(union, "event_id", "value", 16).collect())
    )
    streamed_df = read_bottomk_values_state(spark, workdir, 16)
    assert sorted(map(key, streamed_df.collect())) == batch
    # live quantiles off the state match the batch-sample report
    live = sorted(
        map(
            tuple,
            sampled_quantile_report(
                streamed_df, union, "value", quantiles=((1, 2),)
            ).collect(),
        )
    )
    offline = sorted(
        map(
            tuple,
            sampled_quantile_report(
                bottomk_value_sample(union, "event_id", "value", 16),
                union,
                "value",
                quantiles=((1, 2),),
            ).collect(),
        )
    )
    assert live == offline
    # replay idempotence (own-dir overwrite AND re-take-k law)
    make_bottomk_values_batch_fn(workdir, "event_id", "value", 16)(b0, 0)
    again = sorted(map(key, read_bottomk_values_state(spark, workdir, 16).collect()))
    assert again == batch


def test_streaming_fertility_matches_batch_and_replay(spark, workdir, tmp_path):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.text import (
        tokenizer_fertility_report,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_fertility_batch_fn,
        read_fertility_state,
        streaming_fertility,
    )

    src = str(tmp_path / "fertsrc")
    SCHEMA = "doc_id BIGINT, source STRING, text STRING"
    b0 = spark.createDataFrame(
        [(1, "a", "Hello, world!"), (2, "b", None), (3, "a", "one two three.")],
        SCHEMA,
    )
    b1 = spark.createDataFrame(
        [(4, "a", "more words arrive here"), (5, "c", "zeta!")], SCHEMA
    )
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_fertility(stream, workdir).awaitTermination(180)

    batch = sorted(
        map(tuple, tokenizer_fertility_report(b0.unionByName(b1)).collect())
    )
    streamed = sorted(map(tuple, read_fertility_state(spark, workdir).collect()))
    assert streamed == batch
    # replay of epoch 0 overwrites its own dir: the merged read is unchanged
    make_fertility_batch_fn(workdir)(b0, 0)
    again = sorted(map(tuple, read_fertility_state(spark, workdir).collect()))
    assert again == batch


def test_cms_heavy_hitters_superset_and_verify(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )

    # 3 true heavy keys (>= 50 rows), a long tail of singletons; a tiny
    # 8-slot grid forces collisions so FALSE candidates appear
    rows = (
        [("hot1",)] * 80 + [("hot2",)] * 60 + [("hot3",)] * 50
        + [(f"cold{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "k STRING")
    out = {r.k: r for r in SK.cms_heavy_hitters(df, "k", 50, width=8, depth=2).collect()}
    # every true heavy hitter is a candidate AND verified heavy
    for k, n in (("hot1", 80), ("hot2", 60), ("hot3", 50)):
        assert k in out and out[k].exact == n and out[k].is_heavy
        assert out[k].est >= out[k].exact  # one-sided error
    # collisions on the tiny grid produce candidates the verify rejects
    false_cands = [r for r in out.values() if not r.is_heavy]
    assert false_cands and all(r.est >= 50 > r.exact for r in false_cands)
    # a generous grid removes the false candidates entirely
    wide = {r.k: r for r in SK.cms_heavy_hitters(df, "k", 50, width=1024, depth=4).collect()}
    assert sorted(wide) == ["hot1", "hot2", "hot3"]
    assert all(r.est == r.exact for r in wide.values())
    import pytest as _pt

    with _pt.raises(ValueError):
        SK.cms_heavy_hitters(df, "k", 0)


def test_cms_heavy_hitters_over_streamed_grid(spark, workdir, tmp_path):
    """The sketch= hook composes with the streaming CMS state: hitters
    detected against the MERGED grid of everything the stream has seen
    equal hitters against a batch-built grid over the same rows."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        sketches as SK,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        read_cms_state,
        streaming_cms,
    )

    src = str(tmp_path / "cmssrc")
    mk = lambda ks: spark.createDataFrame([(k,) for k in ks], "k STRING")
    b0 = mk(["hot"] * 40 + [f"c{i}" for i in range(50)])
    b1 = mk(["hot"] * 40 + ["warm"] * 60 + [f"d{i}" for i in range(50)])
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_cms(stream, workdir, "k", width=1024, depth=4).awaitTermination(180)

    union = b0.unionByName(b1)
    grid = read_cms_state(spark, workdir)
    live = sorted(
        map(tuple, SK.cms_heavy_hitters(union, "k", 50, 1024, 4, sketch=grid).collect())
    )
    batch = sorted(
        map(tuple, SK.cms_heavy_hitters(union, "k", 50, 1024, 4).collect())
    )
    assert live == batch
    assert {t[0] for t in live} == {"hot", "warm"}


def test_streaming_votes_matches_batch_and_replay(spark, workdir, tmp_path):
    """r12 annotation shelf streaming member: merged consensus/kappa
    reads equal the batch operators over everything seen — including a
    CROSS-EPOCH duplicate submission (the reason the state is the
    distinct vote LOG, not a counter fold: counters would double-count
    a re-sent vote). Replay of an epoch is a no-op twice over (own-dir
    layout + distinct idempotence)."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.annotation import (
        consensus_labels,
        fleiss_kappa_report,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_votes_batch_fn,
        read_agreement_state,
        read_consensus_state,
        streaming_votes,
    )

    src = str(tmp_path / "votesrc")
    SCHEMA = "item BIGINT, annotator BIGINT, label STRING"
    b0 = spark.createDataFrame(
        [(1, 10, "x"), (1, 11, "x"), (2, 10, "y"), (2, 11, "x")], SCHEMA
    )
    # epoch 1 re-sends (1, 10, "x") — the cross-epoch duplicate — plus
    # new votes
    b1 = spark.createDataFrame(
        [(1, 10, "x"), (1, 12, "y"), (2, 12, "x")], SCHEMA
    )
    b0.coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_votes(stream, workdir).awaitTermination(180)

    union = b0.unionByName(b1)
    batch_cons = sorted(
        map(tuple, consensus_labels(union, "item", "annotator", "label").collect())
    )
    live_cons = sorted(map(tuple, read_consensus_state(spark, workdir).collect()))
    assert live_cons == batch_cons
    # the duplicate counted once: item 1 has 3 raters, not 4
    assert [r for r in batch_cons if r[0] == 1][0][3] == 3

    batch_kappa = fleiss_kappa_report(
        union, "item", "annotator", "label"
    ).first()
    live_kappa = read_agreement_state(spark, workdir).first()
    assert tuple(live_kappa) == tuple(batch_kappa)
    assert live_kappa["n_ratings"] == 6  # 7 submissions, 1 duplicate

    # replay epoch 0: merged reads unchanged
    make_votes_batch_fn(workdir)(b0, 0)
    again = sorted(map(tuple, read_consensus_state(spark, workdir).collect()))
    assert again == batch_cons


def test_streaming_reliability_and_alpha_reads_match_batch(spark, workdir):
    """r13: the reliability census and Krippendorff's alpha read live
    off the same vote log — both equal the batch operators over
    everything seen (the distinct-union exactness carries to every
    derived read)."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.annotation import (
        annotator_reliability,
        krippendorff_alpha,
    )
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_votes_batch_fn,
        read_alpha_state,
        read_reliability_state,
    )

    SCHEMA = "item BIGINT, annotator BIGINT, label STRING"
    b0 = spark.createDataFrame(
        [(1, 10, "x"), (1, 11, "x"), (2, 10, "y"), (2, 11, "x")], SCHEMA
    )
    b1 = spark.createDataFrame(
        [(1, 10, "x"), (1, 12, "y"), (2, 12, "x"), (3, 10, "z")], SCHEMA
    )
    fn = make_votes_batch_fn(workdir)
    fn(b0, 0)
    fn(b1, 1)
    union = b0.unionByName(b1)
    got = sorted(map(tuple, read_reliability_state(spark, workdir).collect()))
    want = sorted(map(tuple, annotator_reliability(
        union, "item", "annotator", "label").collect()))
    assert got == want and got
    ga = read_alpha_state(spark, workdir).first()
    wa = krippendorff_alpha(union, "item", "annotator", "label").first()
    assert ga.asDict() == wa.asDict()
