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

from ..operators import transform as T
from ..operators import validation as V


class NoValidRecordsError(RuntimeError):
    """F10 empty-result guard (transform_spark_job.py:94-95)."""


_last_persisted = None  # most recent cached staging DF (LRU of size 1)


@dataclass
class PriceZoneResult:
    output: DataFrame  # validated, typed, quarantined
    report: V.ValidationReport


def run_price_zone_transform(
    raw: DataFrame,
    active_opcos: list[str],
    already_mapped: bool = False,
) -> PriceZoneResult:
    """raw (staged all-string) → validated+typed+quarantined DataFrame.

    - ``raw`` has columns co_nbr/supc/prc_zone/cust_nbr/eff_from_dttm
      (or the canonical names if ``already_mapped``).
    - Validation runs BEFORE casts on the string staging columns, exactly
      like the reference (transform_spark_job.py:60-84), in one pass.
    - Metadata counts (total/valid/invalid, per-rule invalid opco sets)
      come from the report — no extra scans (reference: 86-94).
    """
    from ..operators.util import ensure_parallelism

    global _last_persisted
    mapped = raw if already_mapped else T.price_zone_mapping(raw)
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
    clean, report = V.validate(mapped, V.price_zone_rules(active_opcos), "opco_id")
    if report.valid_count == 0:
        raise NoValidRecordsError("no valid records after quarantine")
    return PriceZoneResult(output=T.price_zone_derive(clean), report=report)
