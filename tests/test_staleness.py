"""Registry staleness budget (round-9 verdict item 8, rebased round 12).

The driver certifies only the FIRST 50 ``queries()`` entries per round,
so a ~200-query registry needs an explicit rotation discipline or
queries silently age out of hard certification.

Capacity math: with 5 standing slots (the reference-parity core + one
real streaming run every round), each round rotates 45 queries, so a
B-round budget is feasible only while ``|rotating registry| <= 45 * B``.
The round-11 5-round budget (capacity 225) was within 8 queries of its
own tripwire at 207 rotating queries, so round 12 rebased to SIX rounds
(capacity 270).  The ledger rule is now:

    no registry query goes more than 6 rounds without a driver-window
    slot — a query last slotted in round N must hold a slot again no
    later than round N+6 — and a never-certified query introduced in
    round N must hold its FIRST slot no later than round N+3.

``test_budget_capacity`` fails loudly when registry growth approaches
the ceiling; ``test_forward_schedule_is_feasible`` replaces the old
hand-derived per-round plan checks with an EDF (earliest-deadline-
first) cumulative-demand argument — EDF is optimal for unit-size jobs
with deadlines on a fixed-capacity resource, so the check is exact: if
it passes, SOME sequence of future windows satisfies every deadline;
if cumulative demand ever exceeds cumulative capacity, NO composition
can, and the rotation has wedged.

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
# Rebased 6 -> 7 in round 15: the round-15 additions put the rotating
# registry at EXACTLY the six-round alarm line (260 vs capacity 270
# minus the 10-seat headroom), and the capacity test's own remedy is
# "extend MAX_ROUNDS_WITHOUT_SLOT or trim standing slots BEFORE the
# rotation wedges".  Seven rounds gives capacity 315 (45 x 7) — 55
# seats of true headroom — while the never-certified grace stays 3,
# so NEW operators still certify promptly; only the re-certification
# cadence of already-proven queries stretches by one round.  The EDF
# feasibility test re-verifies the whole forward schedule under the
# new budget automatically.
MAX_ROUNDS_WITHOUT_SLOT = 7
NEVER_CERTIFIED_GRACE = 3  # first slot due by INTRODUCED_ROUND + 3
STANDING_SLOTS = 5  # parity core (4) + one real streaming run
WINDOW_SIZE = 50

# the five queries that hold a slot every round (rotation capacity is
# WINDOW_SIZE - STANDING_SLOTS for everything else)
STANDING = {
    "interval_query", "interval_count", "ingest_accounting",
    "json_props_agg", "streaming_hourly_rollup",
}


def _rotating_queries():
    """Registry queries subject to the rotation ledger: excludes the
    standing five and the optional-tier queries (registered only when
    their optional dependency is importable — the driver box lacks
    those deps, so they can never hold a seat; their certification is
    the differential checker on an equipped box)."""
    return [
        q for q in registry.QUERIES
        if q not in registry.OPTIONAL_QUERIES
    ]


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
    return None


def _due_round(name: str, rounds: dict[int, set[str]]) -> int | None:
    """The last round by which `name` must hold a driver-window slot,
    or None if the query is undated (a loud failure elsewhere)."""
    last = _last_slot(name, rounds)
    if last is not None:
        return last + MAX_ROUNDS_WITHOUT_SLOT
    intro = registry.INTRODUCED_ROUND.get(name)
    if intro is None:
        return None
    return intro + NEVER_CERTIFIED_GRACE


def test_budget_capacity():
    """The B-round budget only works while the rotating registry fits in
    B windows.  Fail with headroom (10 queries) so the maintainer bumps
    the budget or trims standing slots BEFORE the rotation wedges."""
    rotating = len([q for q in _rotating_queries() if q not in STANDING])
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
    for name in _rotating_queries():
        if name in window:
            continue  # gets a slot this round
        due = _due_round(name, rounds)
        if due is None:
            undated.append(name)
            continue
        if current > due:
            overdue.append(f"{name} (due r{due}, current r{current})")

    assert not undated, (
        "never-slotted queries missing from registry.INTRODUCED_ROUND "
        f"(the staleness budget needs an age origin): {sorted(undated)}"
    )
    assert not overdue, (
        f"queries out of the r{current} window past their staleness "
        f"deadline — rotate them into DRIVER_WINDOW: {sorted(overdue)}"
    )


def test_window_is_first_50_queries():
    # the driver takes the first 50 queries() keys; the rotation only
    # works if DRIVER_WINDOW and the dict order agree exactly
    assert list(registry.QUERIES)[:WINDOW_SIZE] == registry.DRIVER_WINDOW


def test_never_certified_oracle_queries_are_in_window():
    """A query that has NEVER been driver-certified must take its first
    slot within NEVER_CERTIFIED_GRACE rounds of introduction — local
    sf0.01 runs are the soft check, the driver row is the hard one.

    Round-boundary hardening (round-14 verdict item 1, the sibling of
    the feasibility check's round-12 fix): when the driver's fresh
    CORRECTNESS file's keys EQUAL the on-disk ``DRIVER_WINDOW``, the
    next round's window has not been composed yet — a grace deadline
    landing exactly on the new current round is then "due in the window
    about to be composed", not a violation.  In that state only a
    STRICTLY-past deadline (which would already have been red before
    the artifact dropped) fails.  Once the new window is pasted the
    boundary state clears and due==current queries must hold a seat."""
    rounds = _correctness_rounds()
    current = _current_round(rounds)
    ever_slotted = set().union(*rounds.values())
    window = set(registry.DRIVER_WINDOW)
    boundary_state = window == rounds[max(rounds)]

    stuck = []
    for name in _rotating_queries():
        if name in ever_slotted or name in window:
            continue
        intro = registry.INTRODUCED_ROUND.get(name)
        if intro is None:
            continue  # test_staleness_budget reports undated queries
        due = intro + NEVER_CERTIFIED_GRACE
        if current > due or (current == due and not boundary_state):
            stuck.append(f"{name} (due r{due}, current r{current})")
    assert not stuck, (
        "never-driver-certified queries past the introduction grace and "
        f"out of the upcoming window: {sorted(stuck)}"
    )


def test_forward_schedule_is_feasible():
    """EDF feasibility over the whole future: for every horizon round h,
    the number of rotating queries whose deadline falls at or before h
    must fit in the rotating seats available through h.  Queries in the
    upcoming window are treated as certified this round (deadline resets
    to current + MAX_ROUNDS_WITHOUT_SLOT, beyond every horizon checked).
    This subsumes the old hand-written per-round plan tests: a window
    composition or a new-query burst that wedges ANY future round fails
    here at commit time, naming the first infeasible horizon.

    Round-boundary hardening (round-12 verdict item 1): when the driver
    drops a fresh CORRECTNESS file whose keys EQUAL ``DRIVER_WINDOW``,
    the window on disk is the one that JUST RAN, not the upcoming
    composition — treating it as the upcoming window would double-spend
    the new round's seats on already-fresh queries and redden the suite
    between rounds with nothing actionable.  In that state the upcoming
    window is simply not composed yet, so the check degrades to pure
    EDF feasibility with the upcoming round's seats unassigned (every
    future round, including the upcoming one, is a free 45-seat round).
    """
    rounds = _correctness_rounds()
    current = _current_round(rounds)
    window = set(registry.DRIVER_WINDOW)
    boundary_state = window == rounds[max(rounds)]
    if boundary_state:
        window = set()  # upcoming window not yet composed; seats free

    due_counts: dict[int, int] = {}
    for name in _rotating_queries():
        if name in STANDING or name in window:
            continue
        due = _due_round(name, rounds)
        if due is None:
            continue  # test_staleness_budget reports undated queries
        due_counts[due] = due_counts.get(due, 0) + 1

    rotating_per_round = WINDOW_SIZE - STANDING_SLOTS
    # with the window unassigned, the upcoming round itself is schedulable
    first_scheduled = current if boundary_state else current + 1
    cumulative_demand = sum(
        n for d, n in due_counts.items() if d < first_scheduled
    )
    for h in range(first_scheduled, current + MAX_ROUNDS_WITHOUT_SLOT + 1):
        cumulative_demand += due_counts.get(h, 0)
        cumulative_capacity = rotating_per_round * (h - first_scheduled + 1)
        assert cumulative_demand <= cumulative_capacity, (
            f"rotation wedged: {cumulative_demand} rotating queries are "
            f"due by r{h} but only {cumulative_capacity} rotating seats "
            f"exist in rounds r{first_scheduled}..r{h} — trim additions "
            "or extend the budget"
        )


def test_governance_no_budget_stretch():
    """Round-15 verdict item 2: the staleness budget has been rebased
    5 -> 6 -> 7 rounds as the registry grew, and each stretch dilutes
    re-certification freshness.  SEVEN IS THE CEILING.  If the rotating
    registry approaches the 305 alarm line, the remedy is retiring or
    merging queries — never a fourth stretch — and additions are capped
    at 8 per round from round 16 on so growth stays inside the 42-seat
    headroom instead of racing the alarm line."""
    assert MAX_ROUNDS_WITHOUT_SLOT == 7, (
        "no fourth budget stretch: the round-15 verdict pins the "
        "staleness budget at 7 rounds; if capacity is tight, retire or "
        "merge registry queries instead of stretching the budget"
    )
    rotating = len([q for q in _rotating_queries() if q not in STANDING])
    assert rotating <= 305, (
        f"rotating registry ({rotating}) crossed the 305 alarm line; "
        "retire or merge queries — the 7-round budget may NOT be "
        "stretched (round-15 verdict item 2)"
    )
    from collections import Counter

    per_round = Counter(
        r for r in registry.INTRODUCED_ROUND.values() if r >= 16
    )
    too_many = {r: n for r, n in sorted(per_round.items()) if n > 8}
    assert not too_many, (
        f"more than 8 registry additions in a round: {too_many} — the "
        "round-15 governance cap is <= 8/round"
    )


def test_precommitted_next_window():
    """Round-15 verdict item 2 (the r12/r13 pattern, now checked data
    instead of prose): ``registry.NEXT_WINDOW`` pre-commits the window
    AFTER the upcoming one.  It must be a well-formed 50-query window
    (unique, registered, standing five included, approx-twin invariant
    honored) and must seat every rotating query whose staleness
    deadline lands in the round it will run — so the next round's
    composition can never be both late and surprising.

    Round-boundary aware: in the boundary state (the newest CORRECTNESS
    file's keys == DRIVER_WINDOW) the upcoming window has not been
    pasted yet and NEXT_WINDOW IS the upcoming composition; otherwise
    DRIVER_WINDOW runs at ``current`` and NEXT_WINDOW at ``current+1``
    with DRIVER_WINDOW's seats assumed certified."""
    rounds = _correctness_rounds()
    current = _current_round(rounds)
    window = set(registry.DRIVER_WINDOW)
    nxt = list(registry.NEXT_WINDOW)
    nxt_set = set(nxt)

    assert len(nxt) == WINDOW_SIZE and len(nxt_set) == WINDOW_SIZE
    assert STANDING <= nxt_set, "standing five missing from NEXT_WINDOW"
    unknown = nxt_set - set(registry.QUERIES)
    assert not unknown, f"NEXT_WINDOW names not in the registry: {unknown}"
    for approx, twin in registry.APPROX_TWINS.items():
        if approx in nxt_set:
            assert twin in nxt_set, (
                f"approximate {approx} in NEXT_WINDOW without its audit "
                f"twin {twin}"
            )

    boundary_state = window == rounds[max(rounds)]
    if boundary_state:
        next_round = current  # NEXT_WINDOW is the upcoming composition
        covered = nxt_set
    else:
        next_round = current + 1  # runs after DRIVER_WINDOW certifies
        covered = window | nxt_set
    late = []
    for name in _rotating_queries():
        if name in covered or name in STANDING:
            continue
        due = _due_round(name, rounds)
        if due is not None and due <= next_round:
            late.append(f"{name} (due r{due}, NEXT_WINDOW runs r{next_round})")
    assert not late, (
        "rotating queries fall due in the pre-committed window's round "
        f"but hold no seat in it: {sorted(late)}"
    )


def test_never_certified_check_survives_round_boundary(monkeypatch):
    """Regression for the round-14 judged-tree red: a never-certified
    query whose introduction grace expires EXACTLY at the round the
    driver's fresh artifact implies must not redden the suite while
    DRIVER_WINDOW still holds the just-run composition.  Simulate the
    state that bit round 14: point DRIVER_WINDOW at the newest
    CORRECTNESS file's keys (boundary state) and register a synthetic
    never-slotted query dated so its deadline lands on the new current
    round."""
    rounds = _correctness_rounds()
    current = _current_round(rounds)
    newest = sorted(rounds[max(rounds)])
    monkeypatch.setattr(registry, "DRIVER_WINDOW", newest)
    fake = "zz_boundary_regression_probe"
    monkeypatch.setitem(registry.QUERIES, fake, lambda spark, sf: None)
    monkeypatch.setitem(
        registry.INTRODUCED_ROUND, fake, current - NEVER_CERTIFIED_GRACE
    )
    # due == current on the boundary: must NOT fire
    test_never_certified_oracle_queries_are_in_window()
    # …but a STRICTLY-past deadline still must, even on the boundary
    monkeypatch.setitem(
        registry.INTRODUCED_ROUND, fake, current - NEVER_CERTIFIED_GRACE - 1
    )
    import pytest

    with pytest.raises(AssertionError, match=fake):
        test_never_certified_oracle_queries_are_in_window()


def test_forward_schedule_survives_round_boundary(monkeypatch):
    """Regression for the round-12 judged-tree red: a fresh driver
    CORRECTNESS file landing while DRIVER_WINDOW still holds that same
    round's composition must NOT redden the feasibility check.  Simulate
    by pointing DRIVER_WINDOW at the newest CORRECTNESS file's keys."""
    rounds = _correctness_rounds()
    newest = sorted(rounds[max(rounds)])
    monkeypatch.setattr(registry, "DRIVER_WINDOW", newest)
    test_forward_schedule_is_feasible()  # must not raise
