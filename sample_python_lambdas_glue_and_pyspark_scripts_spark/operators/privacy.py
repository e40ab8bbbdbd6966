"""Privacy / re-identification QA over tabular training data:
k-anonymity census, below-k suppression, and l-diversity — the
compliance companions to the PII scrub (``text.pii_scrub`` removes
direct identifiers from TEXT; these measure and mitigate
QUASI-identifier linkage in structured columns, the Sweeney 2002
attack surface: 87% of the US population is unique on
(zip, birthdate, sex)-shaped triples).

The reference engine has no privacy surface; this extends the
curation shelf the same way the annotation family does.

Determinism: everything here is exact integer counting over
equivalence classes (a groupBy on the quasi-identifier columns); the
single reported ratio per census rounds once to 6dp. NULL
quasi-identifier values are a VALUE (standard treatment — NULL zip
codes form their own linkable class; groupBy already keys them
together), never dropped.

Scale: one keyed aggregate over the quasi-identifier tuple per
operator — class-bounded everything after; suppression is one semi
join of the table against the passing classes. Skewed classes are
groupBy-partial-agg friendly; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60

# sentinel standing in for NULL when a nullable column folds into a
# string key (concat_ws SKIPS nulls, which would collide ('a', NULL)
# with (NULL, 'a')); control chars keep accidental collision with real
# values implausible. Oracle mirror: chr(31) || 'NULL' || chr(31).
_NULL_SENT = "\x1fNULL\x1f"
# unit separator between key parts (oracle mirror: chr(31))
_SEP = "\x1f"


def _classes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__csize")
    )


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity census (Sweeney 2002): one row ``(k, n_rows,
    n_classes, min_class_size, n_rows_below_k, pct_rows_below_k)``
    over the equivalence classes of the quasi-identifier tuple. The
    table IS k-anonymous iff ``min_class_size >= k`` (equivalently
    ``n_rows_below_k = 0``); the pct tells you what suppression would
    cost. ``pct_rows_below_k`` rounds once to 6dp; everything else is
    an exact integer. An empty table reports 0 classes and NULL
    min/pct (nothing to anonymize is not 'anonymous', ``try_divide``).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    classes = _classes(df, qi_cols)
    return classes.agg(
        F.lit(k).cast("int").alias("k"),
        F.coalesce(F.sum("__csize"), F.lit(0)).cast("bigint")
        .alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__csize").alias("min_class_size"),
        F.coalesce(
            F.sum(F.when(F.col("__csize") < k, F.col("__csize"))),
            F.lit(0),
        ).cast("bigint").alias("n_rows_below_k"),
    ).select(
        "k",
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_rows_below_k",
        F.round(
            F.try_divide(
                F.col("n_rows_below_k").cast("double"),
                F.col("n_rows").cast("double"),
            ),
            6,
        ).alias("pct_rows_below_k"),
    )


def suppress_below_k(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """The standard k-anonymity mitigation: drop every row whose
    quasi-identifier equivalence class has fewer than ``k`` members —
    the suppressed table is k-anonymous by construction (classes only
    ever shrink to zero, never below k), and the rows removed are
    exactly ``k_anonymity_report``'s ``n_rows_below_k`` (pinned by
    test). Original column order preserved (keyed semi joins move the
    join key to the front — the r9 note)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    passing = _classes(df, qi_cols).filter(F.col("__csize") >= k).select(
        *qi_cols
    )
    # NULL-safe equality on every qi column: NULL quasi-identifiers are
    # a VALUE here, and a plain semi join would drop every NULL-keyed
    # row regardless of class size
    cond = None
    right = passing.alias("__pk")
    for c in qi_cols:
        # alias-qualify EVERY reference (the self-join lineage rule):
        # the unqualified left side is AMBIGUOUS_REFERENCE on Spark 4
        # because `passing` derives from `df`
        piece = F.col(f"__t.{c}").eqNullSafe(F.col(f"__pk.{c}"))
        cond = piece if cond is None else cond & piece
    return df.alias("__t").join(right, cond, "left_semi").select(
        *[F.col(f"__t.{c}") for c in df.columns]
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity census (Machanavajjhala 2007): k-anonymity
    does not stop attribute disclosure when a class is UNIFORM on the
    sensitive column (everyone in the (zip, age) class has the same
    diagnosis — linkage reveals it without identifying anyone), so
    this reports, per the same equivalence classes, how many carry at
    least ``l`` distinct sensitive values: one row ``(l, n_classes,
    min_distinct_sensitive, n_classes_below_l, pct_classes_below_l)``.
    NULL sensitive values count as a distinct value (the class is not
    uniform if some rows decline the attribute). Exact integers; the
    pct rounds once to 6dp; empty table reports NULLs via
    ``try_divide``."""
    if l < 1:
        raise ValueError("l must be >= 1")
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    per_class = df.groupBy(*qi_cols).agg(
        # count_distinct ignores NULLs — add the null-presence flag so
        # a NULL sensitive value is a distinct value
        (
            F.countDistinct(sensitive_col)
            + F.max(
                F.when(F.col(sensitive_col).isNull(), 1).otherwise(0)
            )
        ).cast("bigint").alias("__nsens")
    )
    return per_class.agg(
        F.lit(l).cast("int").alias("l"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__nsens").alias("min_distinct_sensitive"),
        F.coalesce(
            F.sum(F.when(F.col("__nsens") < l, 1)), F.lit(0)
        ).cast("bigint").alias("n_classes_below_l"),
    ).select(
        "l",
        "n_classes",
        "min_distinct_sensitive",
        "n_classes_below_l",
        F.round(
            F.try_divide(
                F.col("n_classes_below_l").cast("double"),
                F.col("n_classes").cast("double"),
            ),
            6,
        ).alias("pct_classes_below_l"),
    )


def _key_expr(cols: list[Column]) -> Column:
    """NULL-safe injective string key from a tuple of columns."""
    parts = [
        F.coalesce(c.cast("string"), F.lit(_NULL_SENT)) for c in cols
    ]
    return F.concat_ws(_SEP, *parts)


def t_closeness_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    t_num: int,
    t_den: int,
    ordered_values: list | None = None,
) -> DataFrame:
    """t-closeness census (Li 2007): l-diversity still leaks when a
    class's sensitive DISTRIBUTION is far from the table's (a class
    that is 90% one diagnosis in a 1% base-rate table discloses, even
    with l distinct values present), so this measures, per
    quasi-identifier equivalence class, the Earth Mover's Distance
    between the class's sensitive distribution and the global one:

    - **categorical** (``ordered_values=None``): EMD under the
      equal-distance ground metric = total variation distance
      ``0.5 * sum_v |q_v - p_v|``; NULL sensitive values are their own
      category (same convention as :func:`l_diversity_report`).
    - **ordinal** (``ordered_values=[v1 < v2 < ...]``): EMD under the
      rank metric = ``sum_i |cumQ_i - cumP_i| / (m - 1)``; a sensitive
      value not in the list (including NULL) raises at runtime —
      ordinal distance over unranked values is undefined.

    One row: ``(metric, t_num, t_den, n_classes, max_emd,
    n_classes_above_t, pct_classes_above_t)``. The threshold is the
    RATIONAL ``t_num/t_den`` and the above-t cut is ALL-INTEGER
    (``t_den * numer > 2 * t_num * n_c * n`` for categorical, the
    ``(m-1)``-scaled analogue for ordinal) — per-class EMD has exact
    integer numerator ``sum_v |cnt_cv*n - cnt_v*n_c|`` over the common
    denominator, so no float enters the count. ``max_emd`` and the pct
    round once to 6dp.

    Plan: ONE scan of the raw table into the (class, value) count
    table, eagerly checkpointed (three downstream branches — the r12
    report-operator rule); everything after is (classes x alphabet)-
    sized: class and global marginals re-aggregate the checkpoint, and
    the dense grid is a cross join of the two marginals (alphabet is
    assumed small — it is a sensitive CATEGORY column). Integer
    products bound n < ~3e9 rows in int64; past that, cast the numer
    chain to decimal(38,0) — documented, not silently lossy.
    """
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    if t_num < 0 or t_den < 1:
        raise ValueError("threshold must be a rational t_num/t_den "
                         "with t_num >= 0, t_den >= 1")
    ordinal = ordered_values is not None
    if ordinal:
        vals = [str(v) for v in ordered_values]
        if not vals or len(set(vals)) != len(vals):
            raise ValueError("ordered_values must be non-empty and "
                             "free of duplicates")
        pos = F.array_position(
            F.array(*[F.lit(v) for v in vals]), F.col(sensitive_col).cast("string")
        )
        sval = F.when(
            pos == 0,
            F.raise_error(F.concat(
                F.lit("t_closeness: sensitive value not in "
                      "ordered_values: "),
                F.coalesce(F.col(sensitive_col).cast("string"),
                           F.lit("NULL")),
            )),
        ).otherwise(F.col(sensitive_col).cast("string"))
    else:
        sval = F.coalesce(
            F.col(sensitive_col).cast("string"), F.lit(_NULL_SENT)
        )

    cv = df.groupBy(*qi_cols, sval.alias("__v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    return t_closeness_from_counts(
        cv, qi_cols, t_num, t_den, ordered_values
    )


def t_closeness_from_counts(
    cv: DataFrame,
    qi_cols: list[str],
    t_num: int,
    t_den: int,
    ordered_values: list | None = None,
) -> DataFrame:
    """:func:`t_closeness_report` from a pre-aggregated
    ``(qi..., __v string, __cnt bigint)`` count table instead of rows —
    the entry point for histogram-shaped inputs: the streaming
    k-anonymity state built over ``qi_cols + [sensitive]``
    (``streaming.sketch_state.read_kanon_tcloseness_census``), or any
    per-class sensitive-value census. Rows with the same ``__v`` sum;
    the input is eagerly checkpointed here (three marginal branches
    read it — the r12 report-operator rule). For the ordinal metric,
    a ``__v`` that is NULL or not in ``ordered_values`` raises at
    action time (checked on the value MARGINAL, value-alphabet-sized,
    not per row)."""
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    if t_num < 0 or t_den < 1:
        raise ValueError("threshold must be a rational t_num/t_den "
                         "with t_num >= 0, t_den >= 1")
    ordinal = ordered_values is not None
    if ordinal:
        vals = [str(v) for v in ordered_values]
        if not vals or len(set(vals)) != len(vals):
            raise ValueError("ordered_values must be non-empty and "
                             "free of duplicates")
    cv = cv.localCheckpoint(eager=True)
    cls = cv.groupBy(*qi_cols).agg(
        F.sum("__cnt").cast("bigint").alias("__nc")
    )
    gv = cv.groupBy("__v").agg(F.sum("__cnt").cast("bigint").alias("__nv"))
    if ordinal:
        pos = F.array_position(
            F.array(*[F.lit(v) for v in vals]), F.col("__v")
        )
        gv = gv.withColumn(
            "__r",
            F.when(
                F.col("__v").isNull() | (pos == 0),
                F.raise_error(F.concat(
                    F.lit("t_closeness: sensitive value not in "
                          "ordered_values: "),
                    F.coalesce(F.col("__v"), F.lit("NULL")),
                )),
            ).otherwise(pos).cast("bigint"),
        )
    tot = gv.agg(
        F.coalesce(F.sum("__nv"), F.lit(0)).cast("bigint").alias("__n")
    )

    grid = (
        cls.alias("__c")
        .crossJoin(gv.alias("__g"))
        .crossJoin(tot.alias("__t"))
        .join(
            cv.alias("__x"),
            [
                F.col(f"__c.{c}").eqNullSafe(F.col(f"__x.{c}"))
                for c in qi_cols
            ]
            + [F.col("__g.__v") == F.col("__x.__v")],
            "left",
        )
        .select(
            *[F.col(f"__c.{c}") for c in qi_cols],
            F.col("__c.__nc").alias("__nc"),
            F.col("__t.__n").alias("__n"),
            *([F.col("__g.__r").alias("__r")] if ordinal else []),
            F.col("__g.__nv").alias("__nv"),
            F.coalesce(F.col("__x.__cnt"), F.lit(0)).cast("bigint")
            .alias("__cnt"),
        )
    )

    if ordinal:
        w = (
            Window.partitionBy(*qi_cols)
            .orderBy("__r")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wall = Window.partitionBy(*qi_cols)
        grid = grid.select(
            *qi_cols,
            "__nc",
            "__n",
            F.sum("__cnt").over(w).cast("bigint").alias("__ccnt"),
            F.sum("__nv").over(w).cast("bigint").alias("__cnv"),
            F.count(F.lit(1)).over(wall).cast("bigint").alias("__m"),
        )
        per = grid.groupBy(*qi_cols, "__nc", "__n").agg(
            F.sum(F.abs(
                F.col("__ccnt") * F.col("__n")
                - F.col("__cnv") * F.col("__nc")
            )).cast("bigint").alias("__numer"),
            F.greatest(F.max("__m") - F.lit(1), F.lit(1))
            .cast("bigint").alias("__mm1"),
        )
        den = F.col("__nc") * F.col("__n") * F.col("__mm1")
        metric = "ordinal"
    else:
        per = grid.groupBy(*qi_cols, "__nc", "__n").agg(
            F.sum(F.abs(
                F.col("__cnt") * F.col("__n")
                - F.col("__nv") * F.col("__nc")
            )).cast("bigint").alias("__numer"),
        )
        den = F.lit(2) * F.col("__nc") * F.col("__n")
        metric = "categorical"

    per = per.select(
        (F.col("__numer").cast("double") / den.cast("double"))
        .alias("__emd"),
        (F.lit(t_den) * F.col("__numer") > F.lit(t_num) * den)
        .alias("__above"),
    )
    return per.agg(
        F.lit(metric).alias("metric"),
        F.lit(t_num).cast("int").alias("t_num"),
        F.lit(t_den).cast("int").alias("t_den"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.round(F.max("__emd"), 6).alias("max_emd"),
        F.coalesce(F.sum(F.when(F.col("__above"), 1)), F.lit(0))
        .cast("bigint").alias("n_classes_above_t"),
    ).select(
        "metric",
        "t_num",
        "t_den",
        "n_classes",
        "max_emd",
        "n_classes_above_t",
        F.round(
            F.try_divide(
                F.col("n_classes_above_t").cast("double"),
                F.col("n_classes").cast("double"),
            ),
            6,
        ).alias("pct_classes_above_t"),
    )


def cap_user_rows(
    df: DataFrame, user_col: str, cap: int, id_col: str,
    seed: str = "capu|",
) -> DataFrame:
    """Deterministic per-user contribution bound: keep at most ``cap``
    rows per user, chosen by the seeded md5 hash of the row id (a
    reproducible uniform subsample of each user's rows, not
    first-seen-wins — arrival order is not meaningful at 100 TB).
    The bounded-contribution preprocessing step for any
    privacy-accounted release: after capping, one user's presence
    changes any downstream count by at most ``cap``.

    One keyed shuffle on the user column; the window ranks within each
    user only. Column order preserved."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(user_col).orderBy(
        hash60(F.col(id_col).cast("string"), seed=seed),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
        .select(*df.columns)
    )


def dp_count_per_group(
    df: DataFrame,
    group_cols: list[str],
    eps_num: int = 1,
    eps_den: int = 1,
    seed: str = "dp|",
) -> DataFrame:
    """Seeded Laplace-noised group counts — the releasable form of a
    per-group census (per-domain document counts, per-source mix
    shares) calibrated to epsilon = ``eps_num/eps_den`` differential
    privacy for a unit-sensitivity count: noise ~ Laplace(1/eps) via
    inverse-CDF over a seeded md5 uniform, ``noisy_count = round(cnt -
    (1/eps) * sign(u-1/2) * ln(1 - 2|u-1/2|), 6)``.

    DETERMINISM IS A TRADE, stated plainly: the uniform is
    ``(md5(seed||key) % 1e6 + 0.5) / 1e6`` — reproducible across runs
    and engines (that is what makes the release oracle-checkable), and
    quantized to a 1e6 grid, so the noise is the discretized, tail-
    truncated Laplace (|noise| <= ln(1e6)/eps ~ 13.8/eps). A real
    privacy release must treat the seed as a one-time SECRET (a public
    seed reveals the noise, hence the count): fresh secret seed per
    release, never re-released under a new seed. Per-USER epsilon
    additionally requires bounding contribution first —
    :func:`cap_user_rows`, which scales sensitivity (and hence eps)
    by the cap.

    One keyed aggregate; the noise is a map-side projection on the
    group row. NULL group values key via the NULL sentinel."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if eps_num < 1 or eps_den < 1:
        raise ValueError("epsilon must be a positive rational "
                         "eps_num/eps_den with both >= 1")
    b = float(eps_den) / float(eps_num)
    grp = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    h = hash60(_key_expr([F.col(c) for c in group_cols]), seed=seed)
    u = (
        (h % F.lit(1_000_000)).cast("double") + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    v = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )
    return grp.select(
        *group_cols,
        F.round(F.col("__cnt").cast("double") + noise, 6)
        .alias("noisy_count"),
    )


def _ladder_steps(ladder: list[dict]) -> tuple[list[str], list[dict]]:
    if not ladder:
        raise ValueError("ladder must have at least one step")
    cols = list(ladder[0].keys())
    if not cols:
        raise ValueError("ladder steps must map at least one column")
    steps = []
    for i, step in enumerate(ladder):
        if list(step.keys()) != cols:
            raise ValueError(
                f"ladder step {i} must map exactly the same columns "
                f"as step 0 ({cols})"
            )
        steps.append({
            c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in step.items()
        })
    return cols, steps


def generalization_ladder_census(
    df: DataFrame, ladder: list[dict], k: int = 5
) -> DataFrame:
    """Census of a Samarati-style generalization ladder: given a fixed
    climb schedule (step 0 = the raw quasi-identifiers, each later
    step a coarser recoding — bin the age, truncate the zip, star the
    column out), report per step ``(step, n_classes, min_class_size,
    n_rows_below_k, k_anonymous, chosen)`` where ``chosen`` marks the
    FIRST step that reaches k-anonymity (all zero if none does). The
    data-dependent choice is made inside the plan, so the whole ladder
    is one declarative query (and one DuckDB-oracle unroll), not a
    driver loop of censuses.

    Each ``ladder`` entry maps quasi-identifier column name -> recode
    expression (a Column or a SQL string; evaluated against ``df``).
    Every step must map the same column set.

    Plan: ONE scan — each row explodes into (step, generalized-key)
    pairs (rows x steps, steps is a small constant), then a single
    (step, key) aggregate; the per-step census and the chosen-step
    window run over step-counted rows. This beats a per-step census
    loop by steps-1 scans and shuffles."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols, steps = _ladder_steps(ladder)
    pairs = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("step"),
            _key_expr([step[c] for c in cols]).alias("key"),
        )
        for i, step in enumerate(steps)
    ])
    ex = df.select(F.explode(pairs).alias("__e")).select(
        F.col("__e.step").alias("__step"), F.col("__e.key").alias("__key")
    )
    cls = ex.groupBy("__step", "__key").agg(
        F.count(F.lit(1)).cast("bigint").alias("__csize")
    )
    cen = cls.groupBy("__step").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__csize").alias("min_class_size"),
        F.coalesce(
            F.sum(F.when(F.col("__csize") < k, F.col("__csize"))),
            F.lit(0),
        ).cast("bigint").alias("n_rows_below_k"),
    )
    first_ok = F.min(
        F.when(F.col("min_class_size") >= k, F.col("__step"))
    ).over(Window.partitionBy())
    return cen.select(
        F.col("__step").alias("step"),
        "n_classes",
        "min_class_size",
        "n_rows_below_k",
        F.when(F.col("min_class_size") >= k, 1).otherwise(0)
        .cast("int").alias("k_anonymous"),
        F.when(
            first_ok.isNotNull() & (F.col("__step") == first_ok), 1
        ).otherwise(0).cast("int").alias("chosen"),
    ).orderBy("step")


def apply_generalization(
    df: DataFrame, ladder: list[dict], step: int
) -> DataFrame:
    """Recode the quasi-identifier columns to ladder step ``step``,
    preserving every other column and the original column order (the
    generalized column keeps its NAME; its type may coarsen — a
    starred-out int column becomes a string)."""
    cols, steps = _ladder_steps(ladder)
    if not (0 <= step < len(steps)):
        raise ValueError(f"step must be in [0, {len(steps)})")
    chosen = steps[step]
    return df.select(*[
        (chosen[c].alias(c) if c in chosen else F.col(c))
        for c in df.columns
    ])


def generalize_to_k(
    df: DataFrame, ladder: list[dict], k: int = 5
) -> tuple[DataFrame, int | None]:
    """Full k-anonymization: climb the ladder to the first step whose
    recoding is k-anonymous (one bounded collect of the census — a
    steps-sized frame), apply that recoding, and suppress any residual
    below-k classes (a no-op when a step passed; the safety net when
    NO step does — then the LAST step is applied and suppression does
    the rest). Returns ``(anonymized_df, chosen_step)`` with
    ``chosen_step=None`` when suppression had to finish the job. The
    output is k-anonymous by construction either way."""
    cols, _ = _ladder_steps(ladder)
    census = generalization_ladder_census(df, ladder, k).collect()
    chosen = next((r["step"] for r in census if r["chosen"] == 1), None)
    step = chosen if chosen is not None else len(ladder) - 1
    out = apply_generalization(df, ladder, step)
    return suppress_below_k(out, cols, k=k), chosen


def _laplace_noise(key: Column, b: float, seed: str) -> Column:
    """Seeded inverse-CDF Laplace(b) draw off the md5-grid uniform
    (the dp_count_per_group recipe, factored for the sum/mean
    releases)."""
    h = hash60(key, seed=seed)
    u = (
        (h % F.lit(1_000_000)).cast("double") + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    v = u - F.lit(0.5)
    return (
        F.lit(-b)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )


def dp_sum_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    eps_num: int = 1,
    eps_den: int = 1,
    seed: str = "dps|",
) -> DataFrame:
    """Seeded Laplace-noised group SUMS with contribution clipping —
    the second member of the release family. Values clip to
    ``[lo, hi]`` FIRST (unbounded values make the sum's sensitivity
    unbounded, so clipping is not optional; NULL values contribute
    nothing), then noise ~ Laplace(max(|lo|, |hi|)/eps) calibrates to
    the add/remove-one-row sensitivity of the clipped sum.

    Same determinism trade as :func:`dp_count_per_group` (seeded
    md5-grid uniform, one ln, final 6dp round — engine-exact and
    reproducible; the seed must be a one-time secret for real
    privacy), same epsilon-as-rational contract. One keyed aggregate;
    noise is a map-side projection."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if eps_num < 1 or eps_den < 1:
        raise ValueError("epsilon must be a positive rational "
                         "eps_num/eps_den with both >= 1")
    if not lo < hi:
        raise ValueError("clip range must satisfy lo < hi")
    sens = max(abs(lo), abs(hi))
    b = sens * float(eps_den) / float(eps_num)
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(float(lo))),
        F.lit(float(hi)),
    )
    grp = df.groupBy(*group_cols).agg(
        F.coalesce(F.sum(clipped), F.lit(0.0)).alias("__sum")
    )
    noise = _laplace_noise(
        _key_expr([F.col(c) for c in group_cols]), b, seed
    )
    return grp.select(
        *group_cols,
        F.round(F.col("__sum") + noise, 6).alias("noisy_sum"),
    )


def dp_mean_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    eps_num: int = 1,
    eps_den: int = 2,
    seed: str = "dpm|",
) -> DataFrame:
    """Released group means as POST-PROCESSING of a noisy count and a
    noisy clipped sum (each under ``eps_num/eps_den``, so the total
    budget is ``2 * eps_num/eps_den`` by sequential composition —
    hence the halved default; the two draws use derived sub-seeds so
    they are independent). Returns ``(group, noisy_count, noisy_sum,
    noisy_mean)`` with ``noisy_mean = noisy_sum / noisy_count`` 6dp,
    NULL when the noisy count lands <= 0 (a tiny group whose count
    noise swallowed it — reporting a mean there would be noise
    masquerading as signal)."""
    # FUSED single aggregate (count + clipped sum in one groupBy, one
    # input scan) rather than composing dp_count + dp_sum through a
    # join — the released values are bit-identical (same counts, same
    # sums, same sub-seeded draws), the input is read once
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if eps_num < 1 or eps_den < 1:
        raise ValueError("epsilon must be a positive rational "
                         "eps_num/eps_den with both >= 1")
    if not lo < hi:
        raise ValueError("clip range must satisfy lo < hi")
    b_cnt = float(eps_den) / float(eps_num)
    b_sum = max(abs(lo), abs(hi)) * float(eps_den) / float(eps_num)
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(float(lo))),
        F.lit(float(hi)),
    )
    grp = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"),
        F.coalesce(F.sum(clipped), F.lit(0.0)).alias("__sum"),
    )
    key = _key_expr([F.col(c) for c in group_cols])
    return grp.select(
        *group_cols,
        F.round(
            F.col("__cnt").cast("double")
            + _laplace_noise(key, b_cnt, seed + "cnt|"),
            6,
        ).alias("noisy_count"),
        F.round(
            F.col("__sum") + _laplace_noise(key, b_sum, seed + "sum|"),
            6,
        ).alias("noisy_sum"),
    ).select(
        *group_cols,
        "noisy_count",
        "noisy_sum",
        F.round(
            F.when(
                F.col("noisy_count") > 0,
                F.col("noisy_sum") / F.col("noisy_count"),
            ),
            6,
        ).alias("noisy_mean"),
    )


def entropy_l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Entropy l-diversity census (Machanavajjhala 2007 §3.2), the
    stronger diversity reading: a class passes iff the ENTROPY of its
    sensitive distribution is at least ``ln(l)`` — distinct
    l-diversity admits a class that is 98% one diagnosis plus two
    trace values; the entropy form does not. One row ``(l, n_classes,
    min_entropy, n_classes_below_l, pct_classes_below_l)``.

    NULL sensitive values are a category (the family convention).
    Float contract: per-class entropy is a sum of at most
    alphabet-many ``-(p ln p)`` doubles off exact integer ratios,
    rounded ONCE to 6dp, and the pass cut compares the ROUNDED entropy
    against the ROUNDED ``ln(l)`` (both engines round the same ln —
    the r4 threshold-compare rule). Plan: one scan into the
    (class, value) count table, class marginal joined back — both
    class-bounded."""
    if l < 1:
        raise ValueError("l must be >= 1")
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    sval = F.coalesce(
        F.col(sensitive_col).cast("string"), F.lit(_NULL_SENT)
    )
    cv = df.groupBy(*qi_cols, sval.alias("__v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    ).localCheckpoint(eager=True)
    cls = cv.groupBy(*qi_cols).agg(
        F.sum("__cnt").cast("bigint").alias("__nc")
    )
    cond = None
    for c in qi_cols:
        piece = F.col(f"__x.{c}").eqNullSafe(F.col(f"__c.{c}"))
        cond = piece if cond is None else cond & piece
    p_ratio = (
        F.col("__x.__cnt").cast("double")
        / F.col("__c.__nc").cast("double")
    )
    per_class = (
        cv.alias("__x")
        .join(cls.alias("__c"), cond)
        .groupBy(*[F.col(f"__c.{c}") for c in qi_cols])
        .agg(
            F.round(
                -F.sum(p_ratio * F.log(p_ratio)), 6
            ).alias("__h")
        )
    )
    # threshold rounded IN-ENGINE (F.round is HALF_UP; Python round()
    # is banker's — the parity-kit rule), oracle mirrors ROUND(LN(l),6)
    lnl = F.round(F.log(F.lit(float(l))), 6)
    return per_class.agg(
        F.lit(l).cast("int").alias("l"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__h").alias("min_entropy"),
        F.coalesce(
            F.sum(F.when(F.col("__h") < lnl, 1)), F.lit(0)
        ).cast("bigint").alias("n_classes_below_l"),
    ).select(
        "l",
        "n_classes",
        "min_entropy",
        "n_classes_below_l",
        F.round(
            F.try_divide(
                F.col("n_classes_below_l").cast("double"),
                F.col("n_classes").cast("double"),
            ),
            6,
        ).alias("pct_classes_below_l"),
    )
