"""ACTIVE/FUTURE versioned-load planner (SURVEY.md §2.8, §7.1 M4).

The reference maintains two versions of each per-opco target table —
ACTIVE (serving) and FUTURE (being built by a full export) — in a
PRICE_ZONE_MASTER_DATA catalog, and decides per load which tables to
write (/root/reference/src/price_zone/load_job.py:163-181,206-230,252-368):

- full export   → write FUTURE; record min(EFFECTIVE_DATE) in the catalog.
- partial load  → write ACTIVE; ALSO write FUTURE when a full export is
  in flight and this opco is in its RECEIVED_OPCOS set (the dual-write
  rule, load_job.py:252-274,328-343).
- soft-validation policy knob 0=fail / 1=skip / 2=force
  (load_job.py:285-301).

This is a pure decision function, trivially testable (SURVEY.md §2.9 O5).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class ValidationPolicy(int, Enum):
    """O4: the reference's 0/1/2 knob (load_job.py:285-301)."""

    FAIL = 0
    SKIP = 1
    FORCE = 2


@dataclass(frozen=True)
class LoadDecision:
    write_active: bool
    write_future: bool
    record_effective_date: bool
    proceed: bool
    reason: str


def plan_load(
    *,
    is_partial: bool,
    full_export_running: bool,
    opco_in_running_export: bool = False,
    validation_failed: bool = False,
    policy: ValidationPolicy = ValidationPolicy.FAIL,
) -> LoadDecision:
    """Decision table distilled from load_job.py:252-368."""
    if validation_failed:
        if policy == ValidationPolicy.FAIL:
            return LoadDecision(False, False, False, False, "validation failed (policy=FAIL)")
        if policy == ValidationPolicy.SKIP:
            return LoadDecision(False, False, False, True, "validation failed → skipped (policy=SKIP)")
        # FORCE falls through to a normal load
    if is_partial:
        dual = full_export_running and opco_in_running_export
        return LoadDecision(
            write_active=True,
            write_future=dual,
            record_effective_date=False,
            proceed=True,
            reason="partial → ACTIVE" + (" + FUTURE (full export in flight)" if dual else ""),
        )
    return LoadDecision(
        write_active=False,
        write_future=True,
        record_effective_date=True,
        proceed=True,
        reason="full export → FUTURE + effective-date catalog update",
    )


def catalog_lookup(tables: list[dict], table_type: str) -> list[str]:
    """S8 analog: ``SELECT TABLE_NAMES FROM PRICE_ZONE_MASTER_DATA WHERE
    TABLE_TYPE=…`` (load_job.py:163-181) over an in-engine catalog
    (list of {table_type, table_name} rows)."""
    return [t["table_name"] for t in tables if t["table_type"] == table_type]
