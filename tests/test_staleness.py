"""Registry staleness budget (round-9 verdict item 8).

The driver certifies only the FIRST 50 ``queries()`` entries per round,
so a 159-query registry needs an explicit rotation discipline or queries
silently age out of hard certification.  The ledger rule adopted here:

    no registry query goes more than 4 rounds without a driver-window
    slot — a query last slotted in round N must hold a slot again no
    later than round N+4.

These tests encode the rule over the committed CORRECTNESS_r*.json
artifacts (each file's keys ARE that round's window) plus the upcoming
window (``registry.DRIVER_WINDOW``).  A query that has never held a slot
dates from ``registry.INTRODUCED_ROUND`` (maintained by hand, and
REQUIRED by the test — an undated, never-slotted query fails loudly).
The tests are pure JSON/window arithmetic: no SparkSession.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from parcial_bigdata_spark.plans import registry

REPO = Path(__file__).resolve().parent.parent
MAX_ROUNDS_WITHOUT_SLOT = 4


def _correctness_rounds() -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for f in REPO.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", f.name)
        if not m:
            continue
        out[int(m.group(1))] = set(json.loads(f.read_text()))
    return out


def _current_round(rounds: dict[int, set[str]]) -> int:
    # the upcoming driver run is one past the newest recorded window
    return max(rounds) + 1


def test_staleness_budget():
    rounds = _correctness_rounds()
    assert rounds, "no CORRECTNESS_r*.json artifacts found"
    current = _current_round(rounds)
    window = set(registry.DRIVER_WINDOW)

    overdue: list[str] = []
    undated: list[str] = []
    for name in registry.QUERIES:
        if name in window:
            continue  # gets a slot this round
        slotted = [r for r, keys in rounds.items() if name in keys]
        if slotted:
            last = max(slotted)
        elif name in registry.INTRODUCED_ROUND:
            last = registry.INTRODUCED_ROUND[name]
        else:
            undated.append(name)
            continue
        if current - last > MAX_ROUNDS_WITHOUT_SLOT - 1:
            # last slot round N ⇒ must re-enter the window by N+4;
            # being out of the CURRENT window at age 4 is the failure
            overdue.append(f"{name} (last slot r{last}, age {current - last})")

    assert not undated, (
        "never-slotted queries missing from registry.INTRODUCED_ROUND "
        f"(the staleness budget needs an age origin): {sorted(undated)}"
    )
    assert not overdue, (
        f"queries out of the r{current} window past the "
        f"{MAX_ROUNDS_WITHOUT_SLOT}-round staleness budget — rotate them "
        f"into DRIVER_WINDOW: {sorted(overdue)}"
    )


def test_window_is_first_50_queries():
    # the driver takes the first 50 queries() keys; the rotation only
    # works if DRIVER_WINDOW and the dict order agree exactly
    assert list(registry.QUERIES)[:50] == registry.DRIVER_WINDOW


def test_never_certified_oracle_queries_are_in_window():
    """A query with an oracle that has NEVER been driver-certified must
    take a slot in the upcoming window — local sf0.01 runs are the soft
    check, the driver row is the hard one (round-9 verdict item 1).
    Grace: queries introduced THIS round may wait one round (the window
    may already be full when they land)."""
    rounds = _correctness_rounds()
    current = _current_round(rounds)
    ever_slotted = set().union(*rounds.values())
    window = set(registry.DRIVER_WINDOW)

    stuck = [
        name
        for name in registry.QUERIES
        if name not in ever_slotted
        and name not in window
        and registry.INTRODUCED_ROUND.get(name, current) < current
    ]
    assert not stuck, (
        "never-driver-certified queries left out of the upcoming window: "
        f"{sorted(stuck)}"
    )
