"""Streaming data-quality drift monitor — per-batch profiles + deltas.

The validation suite ASSERTS fixed predicates; this monitor MEASURES
each arriving micro-batch (operators/profiling.py) and appends the
profile to a batch-keyed metrics log, so quality drift — null-ratio
creep, cardinality collapse, mean shift — is visible before any
predicate fires. The reference's closest analog is the run-metrics
ledger (metadata_aggregator.py); this is its statistical upgrade.

Mechanics: ``foreachBatch`` writes each batch's column profile and
numeric summary to an immutable ``b{batch_id}`` directory (mode
overwrite → replay-idempotent, same discipline as the SCD2 stream's
versions); ``drift_report`` joins any two batches' profiles and flags
columns whose null ratio moved more than ``null_ratio_tol`` or whose
mean moved more than ``mean_shift_tol`` baseline standard deviations —
the two cheap univariate drift tests that catch most upstream breakage.

Distribution-SHAPE drift (round 6) — the failures the mean/null tests
miss (variance collapse, bimodality, category mix shift at a stable
mean):
- categorical PSI: per-batch category frequency tables (top
  ``max_categories`` by count, rest folded into ``__OTHER__``, NULL as
  ``__NULL__``) feed the population stability index
  Σ (p_cur − p_base)·ln(p_cur / p_base) with ε-floored proportions;
  flag at the standard 0.2 "major shift" threshold.
- numeric KS: per-batch quantile grids (``quantile_fracs`` approx
  percentiles — a bounded sketch, never the raw column) feed the
  two-sample Kolmogorov–Smirnov sup-statistic
  max_x |F_base(x) − F_cur(x)|, evaluated on the merged grids with
  tie-safe cumulative counts.

Everything is aggregate-sized: profiles are one row per column, the log
grows by |columns| + |categories| + |grid| rows per batch, and the
report joins tiny frames. Categorical columns are expected to be
genuinely categorical (the per-batch cap ranking is one small window);
track high-cardinality columns via ``n_distinct`` instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.profiling import numeric_profile, profile_table


def psi_from_counts(
    base_counts: DataFrame, cur_counts: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """Population stability index per column from two category-count
    frames ``(col_name, category, n)``: ``(col_name, psi)`` =
    Σ (p_cur − p_base)·ln(p_cur / p_base), proportions floored at
    ``eps`` so one-sided categories contribute a large-but-finite term.

    Report-time SHARED-category fold: each side's recorded counts were
    capped independently (top ``max_categories`` by that batch's own
    ranking), so a category can be NAMED in one batch but folded into
    ``__OTHER__`` in the other — comparing those rows directly
    double-counts the shift and inflates PSI for columns near the cap.
    A category stays named here only if it is named on BOTH sides;
    everything else (including ``__NULL__`` when one-sided) folds into
    ``__OTHER__`` before proportions, so the two sides are always
    compared over an identical category partition. Genuine appearances
    / disappearances still register through the ``__OTHER__`` mass
    shift. The fold is the identity whenever both sides name the same
    set (the cardinality ≪ cap case).
    """
    shared = (
        base_counts.filter(F.col("category") != "__OTHER__")
        .select("col_name", "category")
        .join(
            cur_counts.filter(F.col("category") != "__OTHER__").select(
                "col_name", "category"
            ),
            ["col_name", "category"],
            "inner",
        )
        .distinct()
        .withColumn("__named", F.lit(True))
    )

    def fold(counts):
        return (
            counts.join(shared, ["col_name", "category"], "left")
            .withColumn(
                "category",
                F.when(F.col("__named"), F.col("category")).otherwise(
                    F.lit("__OTHER__")
                ),
            )
            .groupBy("col_name", "category")
            .agg(F.sum("n").alias("n"))
        )

    tot = Window.partitionBy("col_name")

    def props(counts, alias):
        return fold(counts).select(
            "col_name",
            "category",
            (F.col("n") / F.sum("n").over(tot)).alias(alias),
        )

    b = props(base_counts, "__pb")
    c = props(cur_counts, "__pc")
    j = b.join(c, ["col_name", "category"], "full_outer")
    pb = F.greatest(F.coalesce(F.col("__pb"), F.lit(0.0)), F.lit(eps))
    pc = F.greatest(F.coalesce(F.col("__pc"), F.lit(0.0)), F.lit(eps))
    term = (pc - pb) * F.log(pc / pb)
    return j.groupBy("col_name").agg(F.round(F.sum(term), 6).alias("psi"))


def ks_from_grids(
    base_grid: DataFrame, cur_grid: DataFrame, grid_size: int
) -> DataFrame:
    """Two-sample KS statistic per column from two quantile-grid frames
    ``(col_name, v)``: ``(col_name, ks_stat)`` = max over merged grid
    values of |F_base − F_cur|, each CDF read as (cumulative grid
    points ≤ x) / grid size. Tie-safe: counts aggregate per distinct
    value before the cumulative sum."""
    g = float(grid_size)
    b = base_grid.select(
        "col_name", "v", F.lit(1).alias("__nb"), F.lit(0).alias("__nc")
    )
    c = cur_grid.select(
        "col_name", "v", F.lit(0).alias("__nb"), F.lit(1).alias("__nc")
    )
    merged = (
        b.unionByName(c)
        .groupBy("col_name", "v")
        .agg(F.sum("__nb").alias("nb"), F.sum("__nc").alias("nc"))
    )
    w = (
        Window.partitionBy("col_name")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    diff = F.abs(
        F.sum("nb").over(w) / F.lit(g) - F.sum("nc").over(w) / F.lit(g)
    )
    return (
        merged.withColumn("__d", diff)
        .groupBy("col_name")
        .agg(F.round(F.max("__d"), 6).alias("ks_stat"))
    )


def assemble_drift_report(
    base_prof: DataFrame,
    cur_prof: DataFrame,
    base_numeric: DataFrame | None,
    cur_numeric: DataFrame | None,
    psi: DataFrame | None,
    ks: DataFrame | None,
    null_ratio_tol: float = 0.05,
    mean_shift_tol: float = 0.5,
    psi_tol: float = 0.2,
    ks_tol: float = 0.1,
) -> DataFrame:
    """Join the per-side profile frames into the drift report — the one
    shared assembly behind the streaming monitor's ``drift_report`` and
    the batch companion ``batch_drift_report`` (their values are
    contract-pinned to agree). Inputs: ``profile_table`` frames for
    both sides (required), ``numeric_profile`` frames, and the
    already-computed ``psi`` / ``ks`` frames (None → NULL columns with
    false flags)."""
    base = base_prof.alias("b")
    cur = cur_prof.alias("c")
    ratio = lambda side: F.col(f"{side}.n_null") / F.greatest(  # noqa: E731
        F.col(f"{side}.n_rows"), F.lit(1)
    )
    out = base.join(cur, F.col("b.col_name") == F.col("c.col_name")).select(
        F.col("b.col_name").alias("col_name"),
        F.round(ratio("c") - ratio("b"), 6).alias("null_ratio_delta"),
        F.round(
            F.col("c.n_distinct")
            / F.greatest(F.col("b.n_distinct"), F.lit(1)),
            6,
        ).alias("distinct_ratio"),
    )
    if base_numeric is not None and cur_numeric is not None:
        nb = base_numeric.select(
            F.col("col_name"),
            F.col("mean_val").alias("__bm"),
            F.col("stddev_val").alias("__bs"),
        )
        nc = cur_numeric.select(
            F.col("col_name"), F.col("mean_val").alias("__cm")
        )
        out = (
            out.join(nb, "col_name", "left")
            .join(nc, "col_name", "left")
            .withColumn(
                "mean_shift_sds",
                F.when(
                    F.col("__bs").isNotNull() & (F.col("__bs") > 0),
                    F.round((F.col("__cm") - F.col("__bm")) / F.col("__bs"), 6),
                ),
            )
            .drop("__bm", "__bs", "__cm")
        )
    else:
        out = out.withColumn("mean_shift_sds", F.lit(None).cast("double"))
    if psi is not None:
        out = out.join(psi, "col_name", "left")
    else:
        out = out.withColumn("psi", F.lit(None).cast("double"))
    if ks is not None:
        out = out.join(ks, "col_name", "left")
    else:
        out = out.withColumn("ks_stat", F.lit(None).cast("double"))
    return (
        out.withColumn(
            "null_drift", F.abs(F.col("null_ratio_delta")) > null_ratio_tol
        )
        .withColumn(
            "mean_drift",
            F.coalesce(
                F.abs(F.col("mean_shift_sds")) > mean_shift_tol,
                F.lit(False),
            ),
        )
        .withColumn(
            "psi_drift",
            F.coalesce(F.col("psi") > psi_tol, F.lit(False)),
        )
        .withColumn(
            "ks_drift",
            F.coalesce(F.col("ks_stat") > ks_tol, F.lit(False)),
        )
    )


def batch_drift_report(
    base_df: DataFrame,
    cur_df: DataFrame,
    columns: list[str] | None = None,
    numeric_columns: list[str] | None = None,
    categorical_columns: list[str] | None = None,
    quantile_fracs: int = 99,
    null_ratio_tol: float = 0.05,
    mean_shift_tol: float = 0.5,
    psi_tol: float = 0.2,
    ks_tol: float = 0.1,
) -> DataFrame:
    """Batch companion of ``DriftMonitor.drift_report``: the same
    per-column drift report computed directly between two DataFrames —
    no persisted profile log, no streaming context. This is the
    oracle-facing form (the ``drift_report`` contract query): every
    statistic here is closed-form SQL over the two inputs, so DuckDB
    reproduces it exactly; the streaming monitor shares the identical
    PSI/KS/assembly code paths (``psi_from_counts`` / ``ks_from_grids``
    / ``assemble_drift_report``), which is what extends the oracle's
    proof to the streaming report.

    Differences from the monitor, both forced by oracle parity:
    - quantile grids use EXACT ``percentile`` (the monitor's
      ``approx_percentile`` sketch is the documented 100 TB swap — the
      same exact/approx pairing as price_quantiles[_approx]), built as
      one aggregate + posexplode, no driver collect;
    - grid values round to 6dp so the tie-safe merge groups identically
      across engines.
    Category counts are uncapped (use the monitor for genuinely
    unbounded-cardinality columns); with both sides computed from full
    counts the shared-category fold in ``psi_from_counts`` is the
    identity, which is exactly the regime the oracle mirrors.
    """
    numeric_columns = list(numeric_columns or [])
    categorical_columns = list(categorical_columns or [])
    bp = profile_table(base_df, columns)
    cp = profile_table(cur_df, columns)
    bn = cn = psi = ks = None
    if numeric_columns:
        bn = numeric_profile(base_df, numeric_columns)
        cn = numeric_profile(cur_df, numeric_columns)
        ks = ks_from_grids(
            _exact_quantile_grid(base_df, numeric_columns, quantile_fracs),
            _exact_quantile_grid(cur_df, numeric_columns, quantile_fracs),
            quantile_fracs,
        )
    if categorical_columns:
        psi = psi_from_counts(
            _category_counts(base_df, categorical_columns),
            _category_counts(cur_df, categorical_columns),
        )
    return assemble_drift_report(
        bp, cp, bn, cn, psi, ks,
        null_ratio_tol=null_ratio_tol,
        mean_shift_tol=mean_shift_tol,
        psi_tol=psi_tol,
        ks_tol=ks_tol,
    )


def _category_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uncapped ``(col_name, category, n)`` counts for the batch
    report — one grouped count per column, unioned (each is
    aggregate-sized)."""
    parts = [
        df.groupBy(
            F.coalesce(F.col(c).cast("string"), F.lit("__NULL__")).alias(
                "category"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(c).alias("col_name"), "category", "n")
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _exact_quantile_grid(
    df: DataFrame, cols: list[str], grid: int
) -> DataFrame:
    """Exact-percentile grid ``(col_name, v)`` for the batch report:
    ONE aggregate over all columns (arrays), then per-column posexplode
    of the single result row — distributed percentile computation, no
    driver collect. Values round to 6dp (oracle merge parity)."""
    fracs = [i / (grid + 1) for i in range(1, grid + 1)]
    arr = ", ".join(repr(f) for f in fracs)
    row = df.agg(
        *[
            F.expr(f"percentile({c}, array({arr}))").alias(c)
            for c in cols
        ]
    )
    parts = [
        row.select(
            F.lit(c).alias("col_name"),
            F.explode(c).alias("__v"),
        )
        .select("col_name", F.round("__v", 6).alias("v"))
        .filter(F.col("v").isNotNull())
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@dataclass
class DriftMonitor:
    spark: SparkSession
    path: str
    columns: list[str] | None = None
    numeric_columns: list[str] = field(default_factory=list)
    categorical_columns: list[str] = field(default_factory=list)
    exact_distinct: bool = True  # flip off at corpus scale (HLL)
    quantile_fracs: int = 99  # KS grid resolution (error floor ~1/grid)
    max_categories: int = 100  # PSI state bound per column per batch

    def _dir(self, kind: str, batch_id: int) -> str:
        return f"{self.path}/{kind}/b{batch_id:08d}"

    def record_batch(self, df: DataFrame, batch_id: int) -> None:
        prof = profile_table(
            df, self.columns, exact_distinct=self.exact_distinct
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
        prof.coalesce(1).write.mode("overwrite").parquet(
            self._dir("profile", batch_id)
        )
        if self.numeric_columns:
            nums = numeric_profile(df, self.numeric_columns).withColumn(
                "batch_id", F.lit(int(batch_id)).cast("bigint")
            )
            nums.coalesce(1).write.mode("overwrite").parquet(
                self._dir("numeric", batch_id)
            )
            self._record_quantiles(df, batch_id)
        if self.categorical_columns:
            self._record_categories(df, batch_id)

    def _record_quantiles(self, df: DataFrame, batch_id: int) -> None:
        """One aggregate for all numeric columns' quantile grids — a
        bounded sketch (approx_percentile) per column; the single result
        row is a scalar control-plane collect."""
        g = int(self.quantile_fracs)
        fracs = [i / (g + 1) for i in range(1, g + 1)]
        arr = ", ".join(repr(f) for f in fracs)
        row = df.agg(
            *[
                F.expr(
                    f"approx_percentile({c}, array({arr}), 10000)"
                ).alias(c)
                for c in self.numeric_columns
            ]
        ).collect()[0]
        recs = [
            (c, i + 1, float(v))
            for c in self.numeric_columns
            for i, v in enumerate(row[c] or [])
            if v is not None
        ]
        qdf = self.spark.createDataFrame(
            recs, "col_name string, p_idx int, v double"
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
        qdf.coalesce(1).write.mode("overwrite").parquet(
            self._dir("quantile", batch_id)
        )

    def _record_categories(self, df: DataFrame, batch_id: int) -> None:
        parts = []
        for c in self.categorical_columns:
            counts = df.groupBy(
                F.coalesce(F.col(c).cast("string"), F.lit("__NULL__")).alias(
                    "category"
                )
            ).agg(F.count(F.lit(1)).alias("n"))
            w = Window.orderBy(F.col("n").desc(), F.col("category").asc())
            capped = (
                counts.withColumn("__r", F.row_number().over(w))
                .withColumn(
                    "category",
                    F.when(
                        F.col("__r") <= self.max_categories, F.col("category")
                    ).otherwise(F.lit("__OTHER__")),
                )
                .groupBy("category")
                .agg(F.sum("n").alias("n"))
            )
            parts.append(
                capped.select(
                    F.lit(c).alias("col_name"), "category", "n"
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("bigint")
        ).coalesce(1).write.mode("overwrite").parquet(
            self._dir("cats", batch_id)
        )

    def batch_fn(self):
        def fn(df: DataFrame, batch_id: int) -> None:
            self.record_batch(df, int(batch_id))

        return fn

    # --- read side -------------------------------------------------------
    def profiles(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/profile/b*")

    def numeric_profiles(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/numeric/b*")

    def quantiles(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/quantile/b*")

    def categories(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/cats/b*")

    def _psi(self, baseline_batch: int, current_batch: int) -> DataFrame:
        """Per-categorical-column PSI between two recorded batches —
        delegates to :func:`psi_from_counts` (the report-time
        shared-category fold lives there: each batch's counts were
        capped independently at record time, so the fold is what keeps
        near-cap columns from double-counting the shift)."""
        cats = self.categories()
        return psi_from_counts(
            cats.filter(F.col("batch_id") == baseline_batch),
            cats.filter(F.col("batch_id") == current_batch),
        )

    def _ks(self, baseline_batch: int, current_batch: int) -> DataFrame:
        """Per-numeric-column two-sample KS statistic from the stored
        quantile grids — delegates to :func:`ks_from_grids`."""
        q = self.quantiles()
        return ks_from_grids(
            q.filter(F.col("batch_id") == baseline_batch),
            q.filter(F.col("batch_id") == current_batch),
            self.quantile_fracs,
        )

    def drift_report(
        self,
        baseline_batch: int,
        current_batch: int,
        null_ratio_tol: float = 0.05,
        mean_shift_tol: float = 0.5,
        psi_tol: float = 0.2,
        ks_tol: float = 0.1,
    ) -> DataFrame:
        """Per-column drift between two recorded batches:
        ``(col_name, null_ratio_delta, distinct_ratio, mean_shift_sds,
        psi, ks_stat, null_drift, mean_drift, psi_drift, ks_drift)`` —
        deltas 6dp-rounded, flags true when the tolerance is crossed.
        Columns missing a numeric profile / category table / quantile
        grid get NULL stats and false flags. ``psi``/``ks_stat`` are the
        shape tests: they fire on category-mix shift, variance collapse
        and bimodality that leave the mean untouched. Assembly and the
        PSI/KS formulas are shared verbatim with the oracle-proven
        :func:`batch_drift_report` (contract query ``drift_report``)."""
        p = self.profiles()
        bn = cn = psi = ks = None
        if self.numeric_columns:
            n = self.numeric_profiles()
            bn = n.filter(F.col("batch_id") == baseline_batch)
            cn = n.filter(F.col("batch_id") == current_batch)
            ks = self._ks(baseline_batch, current_batch)
        if self.categorical_columns:
            psi = self._psi(baseline_batch, current_batch)
        return assemble_drift_report(
            p.filter(F.col("batch_id") == baseline_batch),
            p.filter(F.col("batch_id") == current_batch),
            bn, cn, psi, ks,
            null_ratio_tol=null_ratio_tol,
            mean_shift_tol=mean_shift_tol,
            psi_tol=psi_tol,
            ks_tol=ks_tol,
        )
