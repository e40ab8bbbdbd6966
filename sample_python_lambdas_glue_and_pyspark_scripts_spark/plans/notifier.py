"""Datadog metric-name parity with the reference Notifier (O8).

The reference lambda emits exactly these metric series
(/root/reference/src/Notifier/index.py:207-209, 230-233, 256-264):

- price_zone success: ``ref_price_etl.pz_valid_record_count``,
  ``ref_price_etl.pz_invalid_record_count``,
  ``ref_price_etl.pz_total_record_count`` — with
  invalid = total - valid (index.py:193).
- pipeline error events: ``ref_price_etl.price_zone_error`` /
  ``ref_price_etl.pa_error`` = 1 (index.py:230-233).
- PA success: ``ref_price_etl.pa_total_record_count``,
  ``ref_price_etl.pa_invalid_records``, ``ref_price_etl.pa_total_opco_count``,
  ``ref_price_etl.pa_successful_opco_count``,
  ``ref_price_etl.pa_failed_opco_count`` (index.py:256-264).

The engine computes the same name → value dicts from its own artifacts
(``ValidationReport``, run-ledger events); the transport (Datadog API /
Teams webhook) is the caller's hook — plug any ``Callable[[dict], None]``
into ``RunLedger.notifiers``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

PZ_VALID = "ref_price_etl.pz_valid_record_count"
PZ_INVALID = "ref_price_etl.pz_invalid_record_count"
PZ_TOTAL = "ref_price_etl.pz_total_record_count"
PZ_ERROR = "ref_price_etl.price_zone_error"
PA_ERROR = "ref_price_etl.pa_error"
PA_TOTAL = "ref_price_etl.pa_total_record_count"
PA_INVALID = "ref_price_etl.pa_invalid_records"
PA_TOTAL_OPCOS = "ref_price_etl.pa_total_opco_count"
PA_OK_OPCOS = "ref_price_etl.pa_successful_opco_count"
PA_FAILED_OPCOS = "ref_price_etl.pa_failed_opco_count"


def price_zone_metrics(total_count: int, valid_count: int) -> dict[str, int]:
    """The price_zone success triple; invalid derived as total - valid
    exactly like Notifier/index.py:193."""
    return {
        PZ_VALID: valid_count,
        PZ_INVALID: total_count - valid_count,
        PZ_TOTAL: total_count,
    }


def price_zone_metrics_from_report(report: Any) -> dict[str, int]:
    """Adapter from the engine's single-pass ``ValidationReport``."""
    return price_zone_metrics(report.total_count, report.valid_count)


def pa_metrics(
    total_record_count: int,
    invalid_price_record_count: int,
    total_opco_count: int,
    successful_opco_count: int,
    failed_opco_count: int,
) -> dict[str, int]:
    return {
        PA_TOTAL: total_record_count,
        PA_INVALID: invalid_price_record_count,
        PA_TOTAL_OPCOS: total_opco_count,
        PA_OK_OPCOS: successful_opco_count,
        PA_FAILED_OPCOS: failed_opco_count,
    }


def error_metric(pipeline: str) -> dict[str, int]:
    """Pipeline failure counter (= 1), Notifier/index.py:230-233."""
    if pipeline not in ("price_zone", "pa"):
        raise ValueError("pipeline must be 'price_zone' or 'pa'")
    return {PZ_ERROR if pipeline == "price_zone" else PA_ERROR: 1}


def ledger_metric_notifier(
    sink: Callable[[dict[str, int]], None],
) -> Callable[[dict], None]:
    """RunLedger hook: turns ledger events into the reference's metric
    dicts — the pz triple on SUCCEEDED rows, the error counter on FAILED.
    All other statuses (RUNNING, WAITING, ...) emit nothing: the
    reference Notifier fires only on terminal events, and a run-start
    triple of zeros would inject spurious datapoints into the series."""

    def notify(event: dict) -> None:
        status = event.get("status")
        if status == "FAILED":
            sink(error_metric("price_zone"))
        elif status == "SUCCEEDED":
            sink(
                price_zone_metrics(
                    int(event.get("total_count") or 0),
                    int(event.get("valid_count") or 0),
                )
            )

    return notify
