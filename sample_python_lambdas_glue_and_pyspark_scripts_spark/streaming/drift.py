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

Everything is aggregate-sized: profiles are one row per column, the log
grows by |columns| rows per batch, and the report joins two tiny frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profiling import numeric_profile, profile_table


@dataclass
class DriftMonitor:
    spark: SparkSession
    path: str
    columns: list[str] | None = None
    numeric_columns: list[str] = field(default_factory=list)
    exact_distinct: bool = True  # flip off at corpus scale (HLL)

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

    def batch_fn(self):
        def fn(df: DataFrame, batch_id: int) -> None:
            self.record_batch(df, int(batch_id))

        return fn

    # --- read side -------------------------------------------------------
    def profiles(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/profile/b*")

    def numeric_profiles(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/numeric/b*")

    def drift_report(
        self,
        baseline_batch: int,
        current_batch: int,
        null_ratio_tol: float = 0.05,
        mean_shift_tol: float = 0.5,
    ) -> DataFrame:
        """Per-column drift between two recorded batches:
        ``(col_name, null_ratio_delta, distinct_ratio, mean_shift_sds,
        null_drift, mean_drift)`` — deltas 6dp-rounded, flags true when
        the tolerance is crossed. Columns missing a numeric profile get
        NULL mean fields and a false mean flag."""
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
        return out.withColumn(
            "null_drift", F.abs(F.col("null_ratio_delta")) > null_ratio_tol
        ).withColumn(
            "mean_drift",
            F.coalesce(
                F.abs(F.col("mean_shift_sds")) > mean_shift_tol, F.lit(False)
            ),
        )
