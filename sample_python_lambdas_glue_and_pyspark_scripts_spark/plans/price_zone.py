"""The price_zone pipeline, Spark-first (SURVEY.md §3.1).

Reference flow (/root/reference/src/price_zone/transform_spark_job.py):
read CSV → ApplyMapping → 8 validation passes accumulating invalid opcos
→ casts/derives → quarantine anti-filter → metadata counts → empty guard
→ partitioned CSV sink. The reference runs ~12 Spark actions; this plan
runs ONE aggregation action (the validation matrix) plus the sink write.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import transform as T
from ..operators import validation as V


class NoValidRecordsError(RuntimeError):
    """F10 empty-result guard (transform_spark_job.py:94-95)."""


_last_persisted = None  # most recent cached staging DF (LRU of size 1)


@dataclass
class PriceZoneResult:
    output: DataFrame  # validated, typed, quarantined
    report: V.ValidationReport
    # group-level rollup of VALID groups from the SAME single pass as
    # the matrix (group_col, __n, <extra agg names>); None unless
    # ``group_aggs`` was passed
    group_report: DataFrame | None = None


def run_price_zone_transform(
    raw: DataFrame,
    active_opcos: list[str],
    already_mapped: bool = False,
    group_aggs: dict | None = None,
) -> PriceZoneResult:
    """raw (staged all-string) → validated+typed+quarantined DataFrame.

    - ``raw`` has columns co_nbr/supc/prc_zone/cust_nbr/eff_from_dttm
      (or the canonical names if ``already_mapped``).
    - Validation runs BEFORE casts on the string staging columns, exactly
      like the reference (transform_spark_job.py:60-84), in one pass.
    - Metadata counts (total/valid/invalid, per-rule invalid opco sets)
      come from the report — no extra scans (reference: 86-94).
    - ``group_aggs`` (r14, guide §1.2 / the depth_histogram marginal
      precedent): ``{name: aggregate Column}`` computed per group IN
      THE SAME aggregation pass as the violation matrix. Quarantine
      drops whole groups, never rows, so a per-group aggregate over the
      raw rows equals the same aggregate over the quarantined output —
      ``result.group_report`` serves the rollup of valid groups off the
      (≤|groups|-row) checkpointed matrix with ZERO further passes over
      the data (the two-pass validate → rollup shape becomes one pass).
    """
    from ..operators.util import ensure_parallelism

    global _last_persisted
    mapped = raw if already_mapped else T.price_zone_mapping(raw)
    rules = V.price_zone_rules(active_opcos)
    if group_aggs is not None:
        mapped = ensure_parallelism(mapped)
        flagged = V.flag_columns(mapped, rules)
        matrix_df = (
            flagged.groupBy("opco_id")
            .agg(
                *V.matrix_aggs(rules),
                *[c.alias(n) for n, c in group_aggs.items()],
            )
            .localCheckpoint(eager=True)
        )
        matrix_rows = [r.asDict() for r in matrix_df.collect()]
        report = V.report_from_matrix(matrix_rows, rules, "opco_id")
        if report.valid_count == 0:
            raise NoValidRecordsError("no valid records after quarantine")
        clean = V.quarantine(mapped, report.invalid_groups, "opco_id")
        group_report = matrix_df.filter(~V.any_violation(rules)).select(
            "opco_id", F.col("__n"), *group_aggs.keys()
        )
        return PriceZoneResult(
            output=T.price_zone_derive(clean),
            report=report,
            group_report=group_report,
        )
    # the validation pass is regex/parse-heavy: fan small inputs across
    # cores (size-guarded no-op on big scans), and persist so the matrix
    # action and the caller's downstream actions share one evaluation.
    # Only the most recent invocation stays cached — unbounded persists
    # would accumulate across a long-lived session.
    mapped = ensure_parallelism(mapped).persist()
    if _last_persisted is not None:
        try:
            _last_persisted.unpersist()
        except Exception:
            pass  # previous cache belonged to a stopped session
    _last_persisted = mapped
    clean, report = V.validate(mapped, rules, "opco_id")
    if report.valid_count == 0:
        raise NoValidRecordsError("no valid records after quarantine")
    return PriceZoneResult(output=T.price_zone_derive(clean), report=report)
