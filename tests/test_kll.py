"""Deterministic-compaction KLL quantile sketch (operators/kll.py +
streaming/sketch_state.py KLL state): weight preservation, partition-
order determinism, the literal canonical-block merge ≡ direct law, the
error contract under arbitrary merges, exactness below capacity, the
self-measuring report flags, and streaming epoch fold + replay."""

import random
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import kll as K


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="kll-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id BIGINT, v DOUBLE"
    )


def _state(sk):
    return sorted(
        (r["level"], r["val"], r["n"], r["err_budget"]) for r in sk.collect()
    )


def _max_rank_err(rows, vals):
    """Empirical max |est_rank - true_rank| over all sketch values and a
    percentile grid of the data."""
    state = [(r["val"], 1 << r["level"]) for r in rows]
    allv = np.sort(np.array(vals, dtype=np.float64))
    probes = [v for v, _ in state] + list(
        np.percentile(allv, np.arange(0, 101, 10))
    )
    err = 0
    for x in probes:
        est = sum(w for v, w in state if v < x)
        true = int(np.searchsorted(allv, x, side="left"))
        err = max(err, abs(est - true))
    return err


def test_weight_preservation_and_bound(spark):
    random.seed(7)
    shapes = {
        "uniform": [random.random() for _ in range(4000)],
        "sorted": list(range(4000)),
        "two-point": [1.0] * 2000 + [2.0] * 2000,
    }
    for name, vals in shapes.items():
        sk = K.kll_sketch(_df(spark, vals), "v", k=64, n_blocks=8, id_col="id")
        rows = sk.collect()
        assert sum(1 << r["level"] for r in rows) == len(vals), name
        assert all(r["n"] == len(vals) for r in rows), name
        budget = rows[0]["err_budget"]
        assert 0 < budget < len(vals) // 4, name  # bounded and non-trivial
        assert _max_rank_err(rows, vals) <= budget, name


def test_partition_order_determinism(spark):
    random.seed(11)
    vals = [random.gauss(0, 1) for _ in range(3000)]
    df = _df(spark, vals)
    a = K.kll_sketch(df, "v", k=64, n_blocks=8, id_col="id")
    b = K.kll_sketch(
        df.repartition(13, "v").sortWithinPartitions(F.desc("id")),
        "v", k=64, n_blocks=8, id_col="id",
    )
    assert _state(a) == _state(b)


def test_canonical_block_merge_equals_direct_build(spark):
    """The literal merge ≡ direct law: building the four canonical
    blocks separately and folding them pairwise in canonical order
    reproduces the direct n_blocks=4 build EXACTLY."""
    random.seed(3)
    vals = [random.random() * 100 for _ in range(2500)]
    df = _df(spark, vals)
    direct = K.kll_sketch(df, "v", k=32, n_blocks=4, id_col="id")
    seed = F.concat(
        F.col("v").cast("string"), F.lit("|"), F.col("id").cast("string")
    )
    blk = F.pmod(F.xxhash64(seed), F.lit(4))
    parts = [
        K.kll_sketch(df.filter(blk == i), "v", k=32, n_blocks=1, id_col="id")
        for i in range(4)
    ]
    m01 = K.kll_merge(parts[0], parts[1], k=32)
    m23 = K.kll_merge(parts[2], parts[3], k=32)
    merged = K.kll_merge(m01, m23, k=32)
    assert _state(merged) == _state(direct)


def test_arbitrary_merge_keeps_error_contract(spark):
    """Odd/even split does NOT align with the canonical blocks: the
    merged state may differ from the direct build, but its self-
    reported budget must still bound the true rank error vs ALL data —
    and must remain sub-linear."""
    random.seed(19)
    vals = [random.expovariate(1.0) for _ in range(4000)]
    df = _df(spark, vals)
    a = K.kll_sketch(df.filter(F.col("id") % 2 == 0), "v", k=64, id_col="id")
    b = K.kll_sketch(df.filter(F.col("id") % 2 == 1), "v", k=64, id_col="id")
    merged = K.kll_merge(a, b, k=64)
    rows = merged.collect()
    assert sum(1 << r["level"] for r in rows) == len(vals)
    budget = rows[0]["err_budget"]
    assert _max_rank_err(rows, vals) <= budget
    assert budget < len(vals) // 4


def test_exact_below_capacity(spark):
    """n <= k: no compaction ever fires — budget 0, every quantile is
    the exact order statistic."""
    random.seed(5)
    vals = [random.random() for _ in range(50)]
    sk = K.kll_sketch(_df(spark, vals), "v", k=100, n_blocks=4, id_col="id")
    rows = sk.collect()
    assert all(r["level"] == 0 for r in rows)
    assert rows[0]["err_budget"] == 0
    qs = ((1, 4), (1, 2), (9, 10))
    got = {
        (r["q_num"], r["q_den"]): r["est"]
        for r in K.kll_quantiles(sk, qs).collect()
    }
    sv = sorted(vals)
    for num, den in qs:
        r = (50 * num + den - 1) // den
        assert got[(num, den)] == sv[r - 1]


def test_quantile_report_flags_true_and_exact_n(spark):
    random.seed(23)
    rows = [
        (i, ["a", "b"][i % 2], float(random.lognormvariate(0, 1)))
        for i in range(6000)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, g STRING, v DOUBLE")
    sk = K.kll_sketch(df, "v", group_cols=["g"], k=128, n_blocks=8, id_col="id")
    # bound fraction ~ log2(n/k)/k: 4.7% ceiling for k=128 at n=3000
    # (the k=512 contract query sits under the default 2%)
    rep = K.kll_quantile_report(
        sk, df, "v", group_cols=["g"], max_bound_num=3, max_bound_den=64
    ).collect()
    assert len(rep) == 8  # 2 groups x 4 default quantiles
    for r in rep:
        assert r["n_rows"] == 3000
        assert r["rank_ok"] and r["bound_ok"], r


def test_validation(spark):
    df = _df(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="k must be"):
        K.kll_sketch(df, "v", k=1)
    with pytest.raises(ValueError, match="n_blocks"):
        K.kll_sketch(df, "v", n_blocks=0)
    with pytest.raises(ValueError, match="rationals"):
        K.kll_quantiles(K.kll_sketch(df, "v"), quantiles=((3, 2),))


def test_streaming_state_fold_and_replay(spark, workdir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming.sketch_state import (
        make_kll_batch_fn,
        read_kll_state,
    )

    empty = read_kll_state(spark, workdir, k=64)
    assert empty.count() == 0

    random.seed(29)
    v0 = [random.random() for _ in range(1500)]
    v1 = [random.random() + 0.5 for _ in range(1500)]
    fn = make_kll_batch_fn(workdir, "v", k=64, n_blocks=4)
    fn(_df(spark, v0), 0)
    fn(_df(spark, v1), 1)
    merged = read_kll_state(spark, workdir, k=64)
    rows = merged.collect()
    assert sum(1 << r["level"] for r in rows) == 3000
    assert _max_rank_err(rows, v0 + v1) <= rows[0]["err_budget"]

    # replay epoch 0: the canonical build rewrites IDENTICAL content —
    # the merged read is unchanged (replay-idempotent by determinism)
    before = _state(merged)
    fn(_df(spark, v0), 0)
    assert _state(read_kll_state(spark, workdir, k=64)) == before
