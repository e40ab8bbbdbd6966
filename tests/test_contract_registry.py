"""Driver-contract registry invariants (__spark_entry__.py) — these are
what the driver's correctness gate assumes; breaking them silently costs
a round of driver proof."""

import json
import os

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert missing == [], f"queries without oracle_sql entries: {missing}"
    dangling = [n for n in oracles if n not in qs]
    assert dangling == [], f"oracles without queries() entries: {dangling}"


def test_driver_window_is_exactly_50_unique_resolvable_names():
    w = entry._DRIVER_WINDOW_PRIORITY
    assert len(w) == 50  # the driver snapshots exactly the first 50
    assert len(set(w)) == len(w), "duplicate window entries waste slots"
    qs = entry.queries()
    unknown = [n for n in w if n not in qs]
    assert unknown == [], f"window names not in queries(): {unknown}"
    # and the window must actually lead the ordering
    assert list(qs)[:50] == w


def test_window_covers_every_never_driver_checked_query():
    # cumulative driver proof: any query without a green row in a past
    # CORRECTNESS_r*.json must sit inside the 50-slot window so the next
    # driver run records it
    seen = set()
    for fn in sorted(os.listdir(REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(REPO, fn)) as f:
                seen |= set(json.load(f).keys())
    qs = list(entry.queries())
    outside = [n for n in qs if n not in seen and n not in qs[:50]]
    assert outside == [], (
        f"never-driver-checked queries outside the window: {outside}"
    )
