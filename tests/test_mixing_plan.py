"""Training-mix plan (plans/mixing.py): exact-proportion composition,
budget trim, census honesty."""

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans import (
    mixing as MX,
)


def _docs(spark):
    rows = []
    # src_big: 60 docs x 100 chars; src_small: 10 docs x 100 chars
    for i in range(60):
        rows.append((i, "x" * 100, "src_big", 100))
    for i in range(60, 70):
        rows.append((i, "y" * 100, "src_small", 100))
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT"
    )


def test_mix_census_shares_and_weights(spark):
    mixed, census = MX.plan_training_mix(
        _docs(spark), alpha=0.3, weight_unit_col="n_chars"
    )
    c = {r["source"]: r for r in census.collect()}
    assert c["src_big"]["avail_mass"] == 6000
    assert c["src_small"]["avail_mass"] == 1000
    # temperature flattens: big's weight/share advantage < its 6x mass
    assert c["src_big"]["weight"] > c["src_small"]["weight"]
    assert c["src_big"]["weight"] / c["src_small"]["weight"] < 6 ** 0.5
    # the binding source keeps everything (no upsampling)
    total_share = sum(r["achieved_share"] for r in c.values())
    assert abs(total_share - 1.0) < 1e-5
    kept_ids = {r["doc_id"] for r in mixed.collect()}
    assert kept_ids  # non-empty and a subset
    assert kept_ids <= set(range(70))


def test_mix_budget_trim_is_uniform_and_visible(spark):
    docs = _docs(spark)
    full, _ = MX.plan_training_mix(docs, alpha=0.3,
                                   weight_unit_col="n_chars")
    full_mass = full.agg(F.sum("n_chars")).collect()[0][0]
    budget = int(full_mass * 0.5)
    trimmed, census = MX.plan_training_mix(
        docs, alpha=0.3, weight_unit_col="n_chars", budget=budget
    )
    kept = trimmed.agg(F.sum("n_chars")).collect()[0][0] or 0
    assert kept < full_mass  # the trim actually fired
    # trimmed set is a subset of the untrimmed mix (same seeds upstream)
    assert {r["doc_id"] for r in trimmed.collect()} <= {
        r["doc_id"] for r in full.collect()
    }
    # census reports the ACHIEVED masses (sums to the trimmed total)
    assert sum(r["kept_mass"] for r in census.collect()) == kept
    # a budget above the kept mass is a no-op
    untouched, _ = MX.plan_training_mix(
        docs, alpha=0.3, weight_unit_col="n_chars",
        budget=int(full_mass * 10),
    )
    assert untouched.count() == full.count()


def test_unigram_encode_string_ids(spark):
    """The encode schema follows the input id dtype (string-keyed
    corpora get a string id back, not a hardcoded bigint)."""
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        unigram as U,
    )

    train = spark.createDataFrame(
        [("a", "banana band banana"), ("b", "banana banana")],
        "doc_id STRING, text STRING",
    )
    counts = spark.createDataFrame(
        [("banana", 3), ("band", 1)], "word STRING, n BIGINT"
    )
    model = U.unigram_train(counts, vocab_size=12, max_piece_len=3)
    out = U.unigram_encode(train, model)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r["doc_id"]: r["n_pieces"] for r in out.collect()}
    assert set(got) == {"a", "b"} and all(v > 0 for v in got.values())


def test_training_mix_sweep_points_match_standalone_census(spark, sf_dir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.plans.mixing import (
        plan_training_mix,
        training_mix_sweep,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sweep = training_mix_sweep(
        docs, alphas=(0.3, 0.7), weight_unit_col="n_chars"
    ).collect()
    for a in (0.3, 0.7):
        point = sorted(
            (r.source, r.avail_mass, r.weight, r.kept_mass, r.achieved_share)
            for r in sweep
            if r.alpha == a
        )
        _, census = plan_training_mix(docs, alpha=a, weight_unit_col="n_chars")
        standalone = sorted(map(tuple, census.collect()))
        assert point == standalone, a
    # alpha=1 keeps everything (proportional = no downsampling)
    full = training_mix_sweep(docs, alphas=(1.0,), weight_unit_col="n_chars").collect()
    assert all(r.kept_mass == r.avail_mass for r in full)
    import pytest as _pt

    with _pt.raises(ValueError):
        training_mix_sweep(docs, alphas=())
