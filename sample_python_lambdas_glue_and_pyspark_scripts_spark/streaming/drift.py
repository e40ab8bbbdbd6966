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
        """Per-categorical-column PSI between two recorded batches:
        ``(col_name, psi)``. Proportions floored at 1e-6 so categories
        present on one side only contribute a large-but-finite term."""
        cats = self.categories()
        eps = 1e-6

        def side(batch, n_alias):
            f = cats.filter(F.col("batch_id") == batch)
            tot = Window.partitionBy("col_name")
            return f.select(
                "col_name",
                "category",
                (F.col("n") / F.sum("n").over(tot)).alias(n_alias),
            )

        b = side(baseline_batch, "__pb")
        c = side(current_batch, "__pc")
        j = b.join(c, ["col_name", "category"], "full_outer")
        pb = F.greatest(F.coalesce(F.col("__pb"), F.lit(0.0)), F.lit(eps))
        pc = F.greatest(F.coalesce(F.col("__pc"), F.lit(0.0)), F.lit(eps))
        term = (pc - pb) * F.log(pc / pb)
        return j.groupBy("col_name").agg(F.round(F.sum(term), 6).alias("psi"))

    def _ks(self, baseline_batch: int, current_batch: int) -> DataFrame:
        """Per-numeric-column two-sample KS statistic from the stored
        quantile grids: ``(col_name, ks_stat)`` =
        max over merged grid values of |F_base − F_cur|, each CDF read
        as (cumulative grid points ≤ x) / grid size. Tie-safe: counts
        aggregate per distinct value before the cumulative sum."""
        q = self.quantiles()
        g = float(self.quantile_fracs)
        b = q.filter(F.col("batch_id") == baseline_batch).select(
            "col_name", "v", F.lit(1).alias("__nb"), F.lit(0).alias("__nc")
        )
        c = q.filter(F.col("batch_id") == current_batch).select(
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
        and bimodality that leave the mean untouched."""
        p = self.profiles()
        base = p.filter(F.col("batch_id") == baseline_batch).alias("b")
        cur = p.filter(F.col("batch_id") == current_batch).alias("c")
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
        if self.numeric_columns:
            n = self.numeric_profiles()
            nb = n.filter(F.col("batch_id") == baseline_batch).select(
                F.col("col_name"),
                F.col("mean_val").alias("__bm"),
                F.col("stddev_val").alias("__bs"),
            )
            nc = n.filter(F.col("batch_id") == current_batch).select(
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
        if self.categorical_columns:
            out = out.join(self._psi(baseline_batch, current_batch),
                           "col_name", "left")
        else:
            out = out.withColumn("psi", F.lit(None).cast("double"))
        if self.numeric_columns:
            out = out.join(self._ks(baseline_batch, current_batch),
                           "col_name", "left")
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
