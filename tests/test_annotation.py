"""Annotation/label-QA operators: consensus + Fleiss' kappa."""

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    annotation as AN,
)


def test_consensus_majority_ties_and_dedup(spark):
    rows = [
        # item 1: b wins 2-1
        (1, "r1", "b"), (1, "r2", "b"), (1, "r3", "a"),
        # item 2: tie a/b -> lexicographically smallest (a)
        (2, "r1", "a"), (2, "r2", "b"),
        # item 3: duplicate submission collapses; single rater
        (3, "r1", "c"), (3, "r1", "c"),
        # NULLs drop
        (None, "r1", "a"), (4, None, "a"), (4, "r1", None),
    ]
    df = spark.createDataFrame(rows, "item BIGINT, ann STRING, lab STRING")
    out = {
        r["item"]: (r["label"], r["n_votes"], r["n_ratings"])
        for r in AN.consensus_labels(df, "item", "ann", "lab").collect()
    }
    assert out == {1: ("b", 2, 3), 2: ("a", 1, 2), 3: ("c", 1, 1)}


def test_fleiss_kappa_regimes(spark):
    """Perfect agreement -> kappa 1; systematic disagreement on a
    2-label/2-rater table -> kappa < 0; the Fleiss 1971 worked example
    reproduces at 6dp."""
    perfect = spark.createDataFrame(
        [(i, r, "x" if i % 2 else "y") for i in range(4) for r in ("a", "b")],
        "item BIGINT, ann STRING, lab STRING",
    )
    row = AN.fleiss_kappa_report(perfect, "item", "ann", "lab").first()
    assert row["kappa"] == 1.0 and row["p_bar"] == 1.0
    assert row["n_items"] == 4 and row["n_ratings"] == 8

    disagree = spark.createDataFrame(
        [(i, "a", "x") for i in range(4)] + [(i, "b", "y") for i in range(4)],
        "item BIGINT, ann STRING, lab STRING",
    )
    row = AN.fleiss_kappa_report(disagree, "item", "ann", "lab").first()
    assert row["p_bar"] == 0.0 and row["kappa"] < 0

    # Fleiss 1971 example (14 raters, 10 items, 5 categories): kappa
    # = 0.209931 at 6dp (published rounding: 0.210)
    table = [
        (0, 0, 0, 0, 14), (0, 2, 6, 4, 2), (0, 0, 3, 5, 6),
        (0, 3, 9, 2, 0), (2, 2, 8, 1, 1), (7, 7, 0, 0, 0),
        (3, 2, 6, 3, 0), (2, 5, 3, 2, 2), (6, 5, 2, 1, 0),
        (0, 2, 2, 3, 7),
    ]
    rows = []
    for i, counts in enumerate(table):
        rid = 0
        for j, c in enumerate(counts):
            for _ in range(c):
                rows.append((i, f"r{rid}", f"c{j}"))
                rid += 1
    df = spark.createDataFrame(rows, "item BIGINT, ann STRING, lab STRING")
    row = AN.fleiss_kappa_report(df, "item", "ann", "lab").first()
    assert row["n_items"] == 10 and row["n_ratings"] == 140
    assert row["kappa"] == 0.209931


def test_fleiss_kappa_excludes_single_rating_items(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (2, "a", "y")],
        "item BIGINT, ann STRING, lab STRING",
    )
    row = AN.fleiss_kappa_report(df, "item", "ann", "lab").first()
    # item 2 (one rating) must not count anywhere: 1 item, 2 ratings,
    # both x -> p_e = 1 exactly; kappa is NULL (0/0 guard by division)
    assert row["n_items"] == 1 and row["n_ratings"] == 2
    assert row["p_bar"] == 1.0 and row["p_e"] == 1.0
    assert row["kappa"] is None


def test_bradley_terry_orders_strengths_and_counts(spark):
    """a beats b beats c transitively -> strengths order a > b > c;
    the counted form equals the exploded form; never-winners land at
    the documented 0 fixed point; self-pairs and NULLs drop."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("b", "c"), ("a", "c"),
         ("a", "a"), (None, "b"), ("a", None)],
        "winner STRING, loser STRING",
    )
    out = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_strengths(pairs).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert out["a"] > out["b"] > out["c"] == 0.0
    counted = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 2), ("a", "c", 1)],
        "winner STRING, loser STRING, n BIGINT",
    )
    out2 = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_strengths(counted, count_col="n").collect()
    }
    assert out == out2
    with pytest.raises(ValueError, match="n_iter"):
        AN.bradley_terry_strengths(pairs, n_iter=0)


def test_bradley_terry_balanced_is_uniform(spark):
    """A perfectly balanced rock-paper-scissors cycle has no preference
    signal: every strength is exactly 1 at every iteration count."""
    pairs = spark.createDataFrame(
        [("r", "s"), ("s", "p"), ("p", "r")], "winner STRING, loser STRING"
    )
    for it in (1, 3):
        out = {
            r["item"]: r["strength"]
            for r in AN.bradley_terry_strengths(pairs, n_iter=it).collect()
        }
        assert out == {"r": 1.0, "s": 1.0, "p": 1.0}


def _alpha_ref(rows, metric):
    """Independent pure-Python Krippendorff reference (coincidence-
    matrix definition iterated over individual rating pairs — a
    different formulation from the operator's n_uc*n_uk products)."""
    from collections import defaultdict

    by_item = defaultdict(list)
    for it, _ann, lab in set(rows):
        by_item[it].append(lab)
    units = {u: vs for u, vs in by_item.items() if len(vs) >= 2}

    def d2(c, k):
        if metric == "nominal":
            return 0.0 if c == k else 1.0
        return float((c - k) ** 2)

    n = sum(len(vs) for vs in units.values())
    do = 0.0
    for vs in units.values():
        nu = len(vs)
        for c in vs:
            for k in vs:
                do += d2(c, k) / (nu - 1)
    do /= n
    vals = [v for vs in units.values() for v in vs]
    de = sum(d2(c, k) for c in vals for k in vals) / (n * (n - 1))
    if de == 0:
        return None
    return 1 - do / de


def test_krippendorff_alpha_regimes_and_reference(spark):
    sch = "item BIGINT, ann STRING, lab INT"
    # perfect agreement -> alpha = 1 for both metrics
    perfect = spark.createDataFrame(
        [(i, r, i % 3) for i in range(4) for r in ("a", "b")], sch
    )
    for metric in ("nominal", "interval"):
        row = AN.krippendorff_alpha(
            perfect, "item", "ann", "lab", metric
        ).first()
        assert row["alpha"] == 1.0 and row["d_o"] == 0.0

    # every rating one value -> D_e = 0 -> alpha NULL (undefined, not 1)
    degenerate = spark.createDataFrame(
        [(i, r, 7) for i in range(3) for r in ("a", "b")], sch
    )
    row = AN.krippendorff_alpha(degenerate, "item", "ann", "lab").first()
    assert row["alpha"] is None and row["d_e"] == 0.0

    # missing-data fixture (raters skip items; single-rating item 99
    # drops from both sides) vs the independent reference, both metrics
    rows = [
        (1, "a", 1), (1, "b", 1), (1, "c", 2),
        (2, "a", 2), (2, "b", 3),
        (3, "b", 4), (3, "c", 4), (3, "a", 1),
        (4, "a", 1), (4, "c", 5),
        (99, "a", 3),
    ]
    df = spark.createDataFrame(rows, sch)
    for metric in ("nominal", "interval"):
        row = AN.krippendorff_alpha(df, "item", "ann", "lab", metric).first()
        want = round(_alpha_ref(rows, metric) + 1e-12, 6)
        assert abs(row["alpha"] - want) <= 1e-6, (metric, row["alpha"], want)
        assert row["n_items"] == 4 and row["n_ratings"] == 10

    # metric validation (ordinal became a real metric in r13)
    with pytest.raises(ValueError, match="metric"):
        AN.krippendorff_alpha(df, "item", "ann", "lab", "ratio")


def test_krippendorff_interval_weighs_distance(spark):
    """Interval alpha punishes a 1-vs-5 disagreement harder than a
    1-vs-2 one; nominal treats them identically."""
    sch = "item BIGINT, ann STRING, lab INT"
    near = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "a", 1), (2, "b", 1),
         (3, "a", 4), (3, "b", 4)], sch
    )
    far = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 5), (2, "a", 1), (2, "b", 1),
         (3, "a", 4), (3, "b", 4)], sch
    )
    a_near = AN.krippendorff_alpha(near, "item", "ann", "lab", "interval").first()["alpha"]
    a_far = AN.krippendorff_alpha(far, "item", "ann", "lab", "interval").first()["alpha"]
    assert a_near > a_far
    n_nom = AN.krippendorff_alpha(near, "item", "ann", "lab", "nominal").first()["alpha"]
    f_nom = AN.krippendorff_alpha(far, "item", "ann", "lab", "nominal").first()["alpha"]
    assert n_nom == f_nom


def test_annotator_reliability_hand_fixture(spark):
    rows = [
        # item 1: consensus b (2-1)
        (1, "r1", "b"), (1, "r2", "b"), (1, "r3", "a"),
        # item 2: tie a/b -> a
        (2, "r1", "a"), (2, "r2", "b"),
        # item 3: r1 duplicate submission collapses
        (3, "r1", "c"), (3, "r1", "c"),
        # item 4: r1 submits TWO labels (2 votes, 1 item, <=1 can agree)
        (4, "r1", "x"), (4, "r1", "y"), (4, "r2", "x"),
        # NULLs drop
        (None, "r1", "a"), (5, None, "a"), (5, "r1", None),
    ]
    df = spark.createDataFrame(rows, "item BIGINT, ann STRING, lab STRING")
    out = {
        r["annotator"]: (r["n_items"], r["n_votes"], r["n_agree"],
                         r["agreement_rate"])
        for r in AN.annotator_reliability(df, "item", "ann", "lab").collect()
    }
    assert out == {
        "r1": (4, 5, 4, 0.8),
        "r2": (3, 3, 2, 0.666667),
        "r3": (1, 1, 0, 0.0),
    }


def test_bt_win_probabilities_edges(spark):
    s = spark.createDataFrame(
        [("a", 2.0), ("b", 1.0), ("z", 0.0), ("y", 0.0)],
        "item STRING, strength DOUBLE",
    )
    out = {
        (r["i"], r["j"]): r["p_win"]
        for r in AN.bt_win_probabilities(s).collect()
    }
    assert len(out) == 12  # ordered pairs, no diagonal
    assert out[("a", "b")] == 0.666667 and out[("b", "a")] == 0.333333
    # never-winner serves 0 (and 1 mirrored)
    assert out[("z", "a")] == 0.0 and out[("a", "z")] == 1.0
    # two never-winners: 0/0 -> NULL, not an ANSI error
    assert out[("z", "y")] is None and out[("y", "z")] is None
    # empty strengths -> empty matrix
    assert AN.bt_win_probabilities(s.limit(0)).count() == 0


def test_annotator_reliability_loo_hand_fixture(spark):
    rows = [
        # item 1: r1:b r2:b r3:a — LOO(r1)={b,a} tie -> a (disagree);
        # LOO(r2) same; LOO(r3)={b:2} -> b (disagree)
        (1, "r1", "b"), (1, "r2", "b"), (1, "r3", "a"),
        # item 2: r1:a r2:b — each LOO is the other's label: disagree
        (2, "r1", "a"), (2, "r2", "b"),
        # item 3: r1 alone -> unscoreable
        (3, "r1", "c"),
        # item 4: unanimous x -> every LOO agrees
        (4, "r1", "x"), (4, "r2", "x"), (4, "r3", "x"),
        # r9 votes ONLY on a solo item -> nothing scores, rate NULL
        (9, "r9", "q"),
    ]
    df = spark.createDataFrame(rows, "item BIGINT, ann STRING, lab STRING")
    out = {
        r["annotator"]: (r["n_votes"], r["n_votes_scored"], r["n_agree"],
                         r["loo_agreement_rate"])
        for r in AN.annotator_reliability_loo(
            df, "item", "ann", "lab"
        ).collect()
    }
    assert out == {
        "r1": (4, 3, 1, 0.333333),
        "r2": (3, 3, 1, 0.333333),
        "r3": (2, 2, 1, 0.5),
        "r9": (1, 0, 0, None),
    }


def test_loo_removes_self_vote_bias_vs_census(spark):
    """A sole rater reads 100% in the census but is unscoreable under
    LOO — the operator's reason to exist."""
    df = spark.createDataFrame(
        [(1, "solo", "z"), (2, "solo", "z")],
        "item BIGINT, ann STRING, lab STRING",
    )
    census = AN.annotator_reliability(df, "item", "ann", "lab").first()
    loo = AN.annotator_reliability_loo(df, "item", "ann", "lab").first()
    assert census["agreement_rate"] == 1.0
    assert loo["n_votes_scored"] == 0 and loo["loo_agreement_rate"] is None


def test_rao_kupper_theta_one_no_ties_equals_plain_bt(spark):
    """θ=1 with no tie rows reduces exactly to the tie-free MM fit —
    the model-reduction pin."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("a", "c"), ("c", "b")],
        "winner STRING, loser STRING",
    )
    plain = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_strengths(pairs, n_iter=3).collect()
    }
    rk = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_rao_kupper(
            pairs.withColumn("is_tie", F.lit(False)), theta=1.0, n_iter=3
        ).collect()
    }
    assert rk == plain and len(rk) == 3


def test_rao_kupper_ties_and_edges(spark):
    sch = "winner STRING, loser STRING, is_tie BOOLEAN"
    # all-tie input: symmetric -> every strength 1.0
    all_tie = spark.createDataFrame(
        [("a", "b", True), ("b", "c", True), ("a", "c", True)], sch
    )
    out = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_rao_kupper(all_tie, n_iter=3).collect()
    }
    assert out == {"a": 1.0, "b": 1.0, "c": 1.0}

    # never-winner-never-tier pins to the 0 fixed point; a tie-only
    # participant keeps positive strength (ties ARE evidence)
    mixed = spark.createDataFrame(
        [("a", "z", False), ("a", "b", False), ("b", "z", False),
         ("b", "c", True)], sch
    )
    out = {
        r["item"]: r["strength"]
        for r in AN.bradley_terry_rao_kupper(mixed, n_iter=3).collect()
    }
    assert out["z"] == 0.0
    assert out["c"] > 0.0  # tie-only participant keeps positive strength
    # the undefeated player is the clear top of the fit
    assert out["a"] == max(out.values())

    with pytest.raises(ValueError, match="theta"):
        AN.bradley_terry_rao_kupper(all_tie, theta=0.9)


def _alpha_ref_ordinal(rows):
    """Independent ordinal reference: δ²(c,k) = (Σ_{g=c..k} n_g −
    (n_c+n_k)/2)² over the pooled marginals of qualifying units."""
    from collections import Counter, defaultdict

    by_item = defaultdict(list)
    for it, _ann, lab in set(rows):
        by_item[it].append(lab)
    units = {u: vs for u, vs in by_item.items() if len(vs) >= 2}
    vals = [v for vs in units.values() for v in vs]
    n = len(vals)
    marg = Counter(vals)
    order = sorted(marg)

    def d2(c, k):
        lo, hi = min(c, k), max(c, k)
        between = sum(marg[g] for g in order if lo <= g <= hi)
        return (between - (marg[c] + marg[k]) / 2.0) ** 2

    do = 0.0
    for vs in units.values():
        nu = len(vs)
        for c in vs:
            for k in vs:
                do += d2(c, k) / (nu - 1)
    do /= n
    de = sum(d2(c, k) for c in vals for k in vals) / (n * (n - 1))
    if de == 0:
        return None
    return 1 - do / de


def test_krippendorff_ordinal_reference_and_binary_equivalence(spark):
    sch = "item BIGINT, ann STRING, lab INT"
    rows = [
        (1, "a", 1), (1, "b", 1), (1, "c", 2),
        (2, "a", 2), (2, "b", 3),
        (3, "b", 4), (3, "c", 4), (3, "a", 1),
        (4, "a", 1), (4, "c", 5),
        (99, "a", 3),
    ]
    df = spark.createDataFrame(rows, sch)
    row = AN.krippendorff_alpha(df, "item", "ann", "lab", "ordinal").first()
    want = round(_alpha_ref_ordinal(rows) + 1e-12, 6)
    assert abs(row["alpha"] - want) <= 1e-6, (row["alpha"], want)

    # two-value alphabet: ordinal == nominal exactly (both sides scale
    # by the same n²/4 constant)
    binary = [
        (1, "a", 0), (1, "b", 1), (2, "a", 1), (2, "b", 1),
        (3, "a", 0), (3, "b", 0), (4, "a", 1), (4, "b", 0),
    ]
    bdf = spark.createDataFrame(binary, sch)
    nom = AN.krippendorff_alpha(bdf, "item", "ann", "lab", "nominal").first()
    ord_ = AN.krippendorff_alpha(bdf, "item", "ann", "lab", "ordinal").first()
    assert ord_["alpha"] == nom["alpha"]

    # ordinal adapts to the observed distribution: with skewed
    # marginals it diverges from interval
    itv = AN.krippendorff_alpha(df, "item", "ann", "lab", "interval").first()
    assert row["alpha"] != itv["alpha"]


def test_pairwise_cohen_kappa_worked_example(spark):
    """The classic 2x2 Cohen fixture: 20 yes-yes, 5 yes-no, 10 no-yes,
    15 no-no over 50 items -> p_o = 0.7, p_e = 0.5, kappa = 0.4
    exactly."""
    rows = []
    i = 0
    for cnt, (la, lb) in [(20, ("y", "y")), (5, ("y", "n")),
                          (10, ("n", "y")), (15, ("n", "n"))]:
        for _ in range(cnt):
            rows += [(i, "a", la), (i, "b", lb)]
            i += 1
    df = spark.createDataFrame(rows, "item BIGINT, ann STRING, lab STRING")
    out = AN.pairwise_cohen_kappa(df, "item", "ann", "lab").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["annotator_a"], r["annotator_b"]) == ("a", "b")
    assert r["n_shared"] == 50 and r["p_o"] == 0.7 and r["p_e"] == 0.5
    assert r["kappa"] == 0.4


def test_pairwise_cohen_kappa_edges(spark):
    sch = "item BIGINT, ann STRING, lab STRING"
    # both raters constant on ONE label: p_e = 1 -> kappa NULL
    const = spark.createDataFrame(
        [(i, r, "x") for i in range(3) for r in ("a", "b")], sch
    )
    r = AN.pairwise_cohen_kappa(const, "item", "ann", "lab").first()
    assert r["p_o"] == 1.0 and r["p_e"] == 1.0 and r["kappa"] is None

    # perfect non-constant agreement: kappa = 1
    perfect = spark.createDataFrame(
        [(i, r, "x" if i % 2 else "y") for i in range(4) for r in ("a", "b")],
        sch,
    )
    r = AN.pairwise_cohen_kappa(perfect, "item", "ann", "lab").first()
    assert r["kappa"] == 1.0

    # min_items filters thin pairs; three raters -> three ordered pairs
    tri = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (1, "c", "y"),
         (2, "a", "x"), (2, "b", "y")], sch
    )
    pairs = {
        (r["annotator_a"], r["annotator_b"]): r["n_shared"]
        for r in AN.pairwise_cohen_kappa(tri, "item", "ann", "lab").collect()
    }
    assert pairs == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    pairs2 = {
        (r["annotator_a"], r["annotator_b"])
        for r in AN.pairwise_cohen_kappa(
            tri, "item", "ann", "lab", min_items=2
        ).collect()
    }
    assert pairs2 == {("a", "b")}
    with pytest.raises(ValueError, match="min_items"):
        AN.pairwise_cohen_kappa(tri, "item", "ann", "lab", min_items=0)
