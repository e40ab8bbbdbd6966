"""Privacy / re-identification QA operators (operators/privacy.py):
k-anonymity census, below-k suppression, distinct l-diversity."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    privacy as PV,
)

SCH = "zip STRING, age INT, diag STRING"
ROWS = [
    # class (90210, 30): 3 rows, two diagnoses
    ("90210", 30, "flu"), ("90210", 30, "flu"), ("90210", 30, "cold"),
    # class (90210, 40): 1 row -> below k=2, re-identifiable
    ("90210", 40, "flu"),
    # class (10001, 30): 2 rows, UNIFORM diagnosis -> l-diversity hole
    ("10001", 30, "covid"), ("10001", 30, "covid"),
    # NULL zip is a linkable value: its own class of 2
    (None, 50, "flu"), (None, 50, None),
]


def test_k_anonymity_report_hand_census(spark):
    df = spark.createDataFrame(ROWS, SCH)
    r = PV.k_anonymity_report(df, ["zip", "age"], k=2).first()
    assert (r["k"], r["n_rows"], r["n_classes"]) == (2, 8, 4)
    assert r["min_class_size"] == 1
    assert r["n_rows_below_k"] == 1 and r["pct_rows_below_k"] == 0.125

    # k=1 is always satisfied
    r1 = PV.k_anonymity_report(df, ["zip", "age"], k=1).first()
    assert r1["n_rows_below_k"] == 0

    # empty table: 0 classes, NULL min/pct (not 'anonymous')
    r0 = PV.k_anonymity_report(df.limit(0), ["zip", "age"], k=2).first()
    assert r0["n_classes"] == 0 and r0["min_class_size"] is None
    assert r0["pct_rows_below_k"] is None

    with pytest.raises(ValueError, match="k must"):
        PV.k_anonymity_report(df, ["zip"], k=0)
    with pytest.raises(ValueError, match="qi_cols"):
        PV.k_anonymity_report(df, [], k=2)


def test_suppress_below_k_makes_table_anonymous(spark):
    df = spark.createDataFrame(ROWS, SCH)
    out = PV.suppress_below_k(df, ["zip", "age"], k=2)
    assert out.columns == df.columns  # original column order preserved
    # removed exactly the census's below-k rows
    assert out.count() == 8 - 1
    # the singleton class is gone, the NULL-keyed class SURVIVES
    kept = {(r["zip"], r["age"]) for r in out.collect()}
    assert ("90210", 40) not in kept and (None, 50) in kept
    # the suppressed table is k-anonymous by construction
    r = PV.k_anonymity_report(out, ["zip", "age"], k=2).first()
    assert r["n_rows_below_k"] == 0 and r["min_class_size"] >= 2


def test_l_diversity_report_hand_census(spark):
    df = spark.createDataFrame(ROWS, SCH)
    # qi = zip alone: classes 90210 (flu/cold -> 2), 10001 (covid -> 1),
    # NULL (flu + NULL-as-value -> 2)
    r = PV.l_diversity_report(df, ["zip"], "diag", l=2).first()
    assert (r["l"], r["n_classes"]) == (2, 3)
    assert r["min_distinct_sensitive"] == 1
    assert r["n_classes_below_l"] == 1
    assert r["pct_classes_below_l"] == 0.333333

    with pytest.raises(ValueError, match="l must"):
        PV.l_diversity_report(df, ["zip"], "diag", l=0)


def test_t_closeness_categorical_hand(spark):
    # global: flu 4, cold 4; class A all-flu, class B all-cold -> TV 0.5
    rows = [("A", "flu")] * 4 + [("B", "cold")] * 4
    df = spark.createDataFrame(rows, "cls STRING, diag STRING")
    r = PV.t_closeness_report(df, ["cls"], "diag", 2, 10).first()
    assert r["metric"] == "categorical"
    assert (r["t_num"], r["t_den"], r["n_classes"]) == (2, 10, 2)
    assert r["max_emd"] == 0.5
    assert r["n_classes_above_t"] == 2 and r["pct_classes_above_t"] == 1.0
    # the cut is strict and integer-exact: at t = 1/2 exactly, 0.5 is
    # NOT above (t_den*numer = 2*32 = 64 == t_num*2*nc*n = 64)
    r2 = PV.t_closeness_report(df, ["cls"], "diag", 1, 2).first()
    assert r2["n_classes_above_t"] == 0 and r2["max_emd"] == 0.5


def test_t_closeness_null_sensitive_is_a_category(spark):
    rows = [("A", "flu"), ("A", None), ("B", "flu"), ("B", "flu")]
    df = spark.createDataFrame(rows, "cls STRING, diag STRING")
    # global (flu .75, NULL .25); A (.5, .5) -> TV .25; B (1, 0) -> .25
    r = PV.t_closeness_report(df, ["cls"], "diag", 1, 5).first()
    assert r["max_emd"] == 0.25 and r["n_classes_above_t"] == 2


def test_t_closeness_ordinal_hand(spark):
    rows = [("A", "lo")] * 2 + [("B", "mid")] * 2 + [("C", "hi")] * 2
    df = spark.createDataFrame(rows, "cls STRING, sev STRING")
    order = ["lo", "mid", "hi"]
    # cum global (1/3, 2/3, 1); A (1,1,1) -> (2/3+1/3)/2 = .5
    # B (0,1,1) -> (1/3+1/3)/2 = 1/3; C (0,0,1) -> (1/3+2/3)/2 = .5
    r = PV.t_closeness_report(df, ["cls"], "sev", 2, 5, order).first()
    assert r["metric"] == "ordinal" and r["n_classes"] == 3
    assert r["max_emd"] == 0.5
    assert r["n_classes_above_t"] == 2  # A and C at t = 0.4; B is 1/3


def test_t_closeness_two_value_ordinal_equals_categorical(spark):
    # on a two-value alphabet the rank metric == total variation
    # (single cumulative term, m-1 = 1 vs half the two equal |diffs|)
    rows = [("A", "y")] * 3 + [("A", "n")] * 1 + [("B", "n")] * 4
    df = spark.createDataFrame(rows, "cls STRING, v STRING")
    rc = PV.t_closeness_report(df, ["cls"], "v", 1, 3).first()
    ro = PV.t_closeness_report(df, ["cls"], "v", 1, 3, ["n", "y"]).first()
    assert rc["max_emd"] == ro["max_emd"]
    assert rc["n_classes_above_t"] == ro["n_classes_above_t"]


def test_t_closeness_ordinal_unlisted_value_raises(spark):
    df = spark.createDataFrame([("A", "lo"), ("A", "??")], "c STRING, v STRING")
    with pytest.raises(Exception, match="not in ordered_values"):
        PV.t_closeness_report(df, ["c"], "v", 1, 5, ["lo", "hi"]).collect()
    with pytest.raises(ValueError, match="ordered_values"):
        PV.t_closeness_report(df, ["c"], "v", 1, 5, ["lo", "lo"])
    with pytest.raises(ValueError, match="threshold"):
        PV.t_closeness_report(df, ["c"], "v", 1, 0)


def test_dp_count_per_group_deterministic_and_calibrated(spark):
    df = spark.createDataFrame(
        [(i % 3, i) for i in range(30)], "g INT, id INT"
    )
    out = {r["g"]: r["noisy_count"]
           for r in PV.dp_count_per_group(df, ["g"], 1, 1, "s1|").collect()}
    again = {r["g"]: r["noisy_count"]
             for r in PV.dp_count_per_group(df, ["g"], 1, 1, "s1|").collect()}
    assert out == again  # seeded release is reproducible
    other = {r["g"]: r["noisy_count"]
             for r in PV.dp_count_per_group(df, ["g"], 1, 1, "s2|").collect()}
    assert out != other  # fresh seed -> fresh noise
    for g, v in out.items():
        # |noise| <= ln(1e6)/eps ~ 13.816 (grid-truncated Laplace)
        assert abs(v - 10) <= 13.82
    # noise scales exactly as 1/eps (same uniform draw)
    half = {r["g"]: r["noisy_count"]
            for r in PV.dp_count_per_group(df, ["g"], 2, 1, "s1|").collect()}
    for g in out:
        assert abs((out[g] - 10) - 2 * (half[g] - 10)) < 5e-6
    with pytest.raises(ValueError, match="epsilon"):
        PV.dp_count_per_group(df, ["g"], 0, 1)
    with pytest.raises(ValueError, match="group_cols"):
        PV.dp_count_per_group(df, [], 1, 1)


def test_cap_user_rows(spark):
    df = spark.createDataFrame(
        [(i % 4, i, f"d{i}") for i in range(40)],
        "user INT, id INT, payload STRING",
    )
    out = PV.cap_user_rows(df, "user", 3, "id")
    assert out.columns == df.columns
    counts = {r["user"]: r["n"] for r in
              out.groupBy("user").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}
    # deterministic: same kept set on a rerun
    ids1 = {r["id"] for r in out.collect()}
    ids2 = {r["id"] for r in PV.cap_user_rows(df, "user", 3, "id").collect()}
    assert ids1 == ids2
    # cap >= rows per user -> identity
    assert PV.cap_user_rows(df, "user", 100, "id").count() == 40
    with pytest.raises(ValueError, match="cap"):
        PV.cap_user_rows(df, "user", 0, "id")


LADDER_SCH = "zip STRING, age INT, diag STRING"
LADDER_ROWS = [
    ("90210", 30, "flu"), ("90210", 30, "flu"), ("90210", 30, "cold"),
    ("90210", 40, "flu"),
    ("10001", 30, "covid"), ("10001", 30, "covid"),
    (None, 50, "flu"), (None, 50, None),
]


def _ladder():
    return [
        {"zip": F.col("zip"), "age": F.col("age")},
        {"zip": F.col("zip"), "age": F.expr("age div 20")},
        {"zip": F.lit("*"), "age": F.expr("age div 20")},
        {"zip": F.lit("*"), "age": F.lit("*")},
    ]


def test_generalization_ladder_census(spark):
    df = spark.createDataFrame(LADDER_ROWS, LADDER_SCH)
    rows = PV.generalization_ladder_census(df, _ladder(), k=3).collect()
    by_step = {r["step"]: r for r in rows}
    assert sorted(by_step) == [0, 1, 2, 3]
    # step 0: classes 3/1/2/2; step 1 merges nothing (age 30->1, 40->2,
    # 50->2 but zips differ); step 2 stars the zip: (*,1)=5, (*,2)=3
    assert by_step[0]["min_class_size"] == 1
    assert by_step[0]["k_anonymous"] == 0 and by_step[0]["chosen"] == 0
    assert by_step[1]["min_class_size"] == 1
    assert by_step[2]["n_classes"] == 2
    assert by_step[2]["min_class_size"] == 3
    assert by_step[2]["k_anonymous"] == 1 and by_step[2]["chosen"] == 1
    # step 3 also passes but is NOT chosen (first passing step wins)
    assert by_step[3]["k_anonymous"] == 1 and by_step[3]["chosen"] == 0
    assert by_step[0]["n_rows_below_k"] == 8 - 3  # only the 3-class passes


def test_generalize_to_k_end_to_end(spark):
    df = spark.createDataFrame(LADDER_ROWS, LADDER_SCH)
    anon, step = PV.generalize_to_k(df, _ladder(), k=3)
    assert step == 2
    assert anon.count() == 8  # chosen step passed; suppression a no-op
    assert anon.columns == df.columns
    r = PV.k_anonymity_report(anon, ["zip", "age"], k=3).first()
    assert r["n_rows_below_k"] == 0
    # no step reaches k=10 (n=8): last step + suppression empties it
    anon10, step10 = PV.generalize_to_k(df, _ladder(), k=10)
    assert step10 is None and anon10.count() == 0
    with pytest.raises(ValueError, match="same columns"):
        PV.generalization_ladder_census(
            df, [{"zip": F.col("zip")}, {"age": F.col("age")}], k=2
        )
    with pytest.raises(ValueError, match="step must"):
        PV.apply_generalization(df, _ladder(), 9)


def test_dp_sum_per_group_clipping_and_determinism(spark):
    df = spark.createDataFrame(
        [(0, 5.0), (0, 500.0), (0, -50.0), (1, 2.0), (1, 3.0)],
        "g INT, v DOUBLE",
    )
    out = {r["g"]: r["noisy_sum"]
           for r in PV.dp_sum_per_group(
               df, ["g"], "v", 0.0, 10.0, 1, 1, "t|").collect()}
    again = {r["g"]: r["noisy_sum"]
             for r in PV.dp_sum_per_group(
                 df, ["g"], "v", 0.0, 10.0, 1, 1, "t|").collect()}
    assert out == again
    # clipped sums: g0 = 5 + 10 + 0 = 15; g1 = 5. noise bounded by
    # sens * ln(1e6) = 10 * 13.816
    assert abs(out[0] - 15.0) <= 138.2 and abs(out[1] - 5.0) <= 138.2
    # NULL values contribute nothing
    dfn = spark.createDataFrame([(0, None), (0, 4.0)], "g INT, v DOUBLE")
    r = PV.dp_sum_per_group(dfn, ["g"], "v", 0.0, 10.0, 1, 1, "t|").first()
    assert abs(r["noisy_sum"] - 4.0) <= 138.2
    with pytest.raises(ValueError, match="lo < hi"):
        PV.dp_sum_per_group(df, ["g"], "v", 5.0, 5.0)


def test_dp_mean_per_group_post_processing(spark):
    df = spark.createDataFrame(
        [(0, float(i % 10)) for i in range(200)] + [(1, 5.0)],
        "g INT, v DOUBLE",
    )
    out = {r["g"]: r for r in PV.dp_mean_per_group(
        df, ["g"], "v", 0.0, 10.0, 1, 2, "m|").collect()}
    # big group: mean of 0..9 uniform = 4.5, noise/200 is small
    r0 = out[0]
    assert r0["noisy_mean"] == round(
        r0["noisy_sum"] / r0["noisy_count"], 6
    )
    assert abs(r0["noisy_mean"] - 4.5) < 2.0
    # sub-seeds differ: count noise != sum noise pattern (they are
    # independent draws, so equality would be a seed-derivation bug)
    assert (r0["noisy_count"] - 200.0) != (r0["noisy_sum"] - 900.0)


def test_entropy_l_diversity_hand_census(spark):
    import math
    # class A: uniform over 2 values -> H = ln 2 (passes l=2 at equality)
    # class B: 98-1-1 style skew: 8-1-1 over 10 -> H ~ 0.639 < ln 2,
    #   even though it has THREE distinct values (distinct-l admits it)
    rows = (
        [("A", "x"), ("A", "y")] * 2
        + [("B", "x")] * 8 + [("B", "y"), ("B", "z")]
    )
    df = spark.createDataFrame(rows, "cls STRING, v STRING")
    r = PV.entropy_l_diversity_report(df, ["cls"], "v", l=2).first()
    assert (r["l"], r["n_classes"]) == (2, 2)
    h_b = round(-(0.8 * math.log(0.8) + 2 * 0.1 * math.log(0.1)), 6)
    assert r["min_entropy"] == h_b
    assert r["n_classes_below_l"] == 1  # B fails, A passes at ln 2
    # distinct l-diversity ADMITS class B (3 distinct values >= 2)
    d = PV.l_diversity_report(df, ["cls"], "v", l=2).first()
    assert d["n_classes_below_l"] == 0
    # uniform-at-equality is a PASS (rounded H == rounded ln l, strict <)
    with pytest.raises(ValueError, match="l must"):
        PV.entropy_l_diversity_report(df, ["cls"], "v", l=0)
