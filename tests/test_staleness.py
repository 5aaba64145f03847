"""Registry staleness budget (round-9 verdict item 8, rebased round 11).

The driver certifies only the FIRST 50 ``queries()`` entries per round,
so a ~200-query registry needs an explicit rotation discipline or
queries silently age out of hard certification.

Capacity math (round-10 verdict item 1): with 5 standing slots (the
reference-parity core + one real streaming run every round), each round
rotates 45 queries, so a B-round budget is feasible only while
``|rotating registry| <= 45 * B``.  The round-9 4-round budget became
jointly unsatisfiable at 193 rotating queries (capacity 180) — by round
14 every query would have needed a slot in 4x45=180 seats.  The ledger
rule is therefore now:

    no registry query goes more than 5 rounds without a driver-window
    slot — a query last slotted in round N must hold a slot again no
    later than round N+5 — and a never-certified query introduced in
    round N must hold its FIRST slot no later than round N+3.

``test_budget_capacity`` fails loudly when registry growth approaches
the 225-query ceiling, instead of letting the rotation wedge again.

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
MAX_ROUNDS_WITHOUT_SLOT = 5
NEVER_CERTIFIED_GRACE = 3  # first slot due by INTRODUCED_ROUND + 3
STANDING_SLOTS = 5  # parity core (4) + one real streaming run
WINDOW_SIZE = 50

# the five queries that hold a slot every round (rotation capacity is
# WINDOW_SIZE - STANDING_SLOTS for everything else)
STANDING = {
    "interval_query", "interval_count", "ingest_accounting",
    "json_props_agg", "streaming_hourly_rollup",
}


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


def _last_slot(name: str, rounds: dict[int, set[str]]) -> int | None:
    slotted = [r for r, keys in rounds.items() if name in keys]
    if slotted:
        return max(slotted)
    return registry.INTRODUCED_ROUND.get(name)


def test_budget_capacity():
    """The B-round budget only works while the rotating registry fits in
    B windows.  Fail with headroom (10 queries) so the maintainer bumps
    the budget or trims standing slots BEFORE the rotation wedges."""
    rotating = len([q for q in registry.QUERIES if q not in STANDING])
    capacity = (WINDOW_SIZE - STANDING_SLOTS) * MAX_ROUNDS_WITHOUT_SLOT
    assert rotating <= capacity - 10, (
        f"rotating registry ({rotating}) is within 10 of the "
        f"{MAX_ROUNDS_WITHOUT_SLOT}-round budget capacity ({capacity}); "
        "extend MAX_ROUNDS_WITHOUT_SLOT or trim standing slots before "
        "adding more queries"
    )


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
        last = _last_slot(name, rounds)
        if last is None:
            undated.append(name)
            continue
        if current - last > MAX_ROUNDS_WITHOUT_SLOT - 1:
            # last slot round N ⇒ must re-enter the window by N+5;
            # being out of the CURRENT window at age 5 is the failure
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
    assert list(registry.QUERIES)[:WINDOW_SIZE] == registry.DRIVER_WINDOW


def test_never_certified_oracle_queries_are_in_window():
    """A query that has NEVER been driver-certified must take its first
    slot within NEVER_CERTIFIED_GRACE rounds of introduction — local
    sf0.01 runs are the soft check, the driver row is the hard one.

    Round-10 verdict item 1: the round-9 form of this test (first slot
    the round after introduction) demanded 58 queries for 50 seats; the
    grace now matches the window arithmetic (a 39-query introduction
    burst takes two 25/13 tranches to drain, so first-slot-due is
    introduced+3, landing tranche 2 in r12 with a round to spare)."""
    rounds = _correctness_rounds()
    current = _current_round(rounds)
    ever_slotted = set().union(*rounds.values())
    window = set(registry.DRIVER_WINDOW)

    stuck = [
        name
        for name in registry.QUERIES
        if name not in ever_slotted
        and name not in window
        and current >= registry.INTRODUCED_ROUND.get(name, current)
        + NEVER_CERTIFIED_GRACE
    ]
    assert not stuck, (
        "never-driver-certified queries past the introduction grace and "
        f"out of the upcoming window: {sorted(stuck)}"
    )


def test_r12_plan_is_feasible():
    """Round-10 verdict item 2: the r12 window is already committed to
    the r8 TPC-H/window block (due r13) — prove NOW that the planned r12
    composition (standing + the round-10 tranche-2 leftovers + 32 of the
    r8 block) satisfies both staleness rules, so the r12 rotation is a
    paste, not a re-derivation that discovers an overflow."""
    rounds = _correctness_rounds()
    current = _current_round(rounds)
    if current != 11:  # the plan is for the r11→r12 handoff only
        return

    leftovers = set(registry._R12_PLAN_NEVER_CERTIFIED)
    window = set(registry.DRIVER_WINDOW)

    # every never-certified query whose introduction grace expires by
    # r13 is either in the r11 window or planned for r12; queries
    # introduced in r11 itself are due r14 and ride the r14 headroom
    ever_slotted = set().union(*rounds.values())
    never = {
        n for n in registry.QUERIES
        if n not in ever_slotted and n not in window
        and registry.INTRODUCED_ROUND.get(n, current) < current
    }
    assert never == leftovers, (
        "r12 plan out of sync with the never-certified backlog: "
        f"unplanned={sorted(never - leftovers)} "
        f"stale-plan={sorted(leftovers - never)}"
    )

    # simulate r11 certification, then check r12 seat arithmetic:
    # forced-at-r12 (age 5, i.e. last slot <= r7 and not in r11 window)
    # + tranche-2 leftovers + standing must fit in 50 seats, leaving
    # enough r12/r13 room for the 45-query r8 block due r13.
    forced_r12 = [
        n for n in registry.QUERIES
        if n not in window and n not in STANDING
        and (last := _last_slot(n, rounds)) is not None
        and (12 - last) > MAX_ROUNDS_WITHOUT_SLOT - 1
    ]
    r12_mandatory = STANDING_SLOTS + len(forced_r12) + len(leftovers)
    assert r12_mandatory <= WINDOW_SIZE, (
        f"r12 overflow: {r12_mandatory} mandatory seats for "
        f"{WINDOW_SIZE} slots (forced={sorted(forced_r12)})"
    )
    # the r8 block (due r13) must fit in the r12 slack + r13's rotation
    r8_block = [
        n for n in registry.QUERIES
        if n not in window and n not in STANDING
        and _last_slot(n, rounds) == 8
    ]
    r12_slack = WINDOW_SIZE - r12_mandatory
    r13_capacity = WINDOW_SIZE - STANDING_SLOTS
    assert len(r8_block) <= r12_slack + r13_capacity, (
        f"r8 block ({len(r8_block)}) cannot drain through r12 slack "
        f"({r12_slack}) + r13 ({r13_capacity})"
    )
