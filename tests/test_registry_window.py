"""Driver-window invariant: the correctness gate records only the first
~50 entries of ``queries()`` in dict order. Every registered query must
therefore be either (a) inside the current first-50 window or (b) already
hard-verified recently — a green row in one of the TWO highest-numbered
CORRECTNESS_r*.json files (the "r{N} ∪ r{N-1} covers all" bar). Older
rounds don't count: round 4 showed a query can be green in r03 for an old
implementation and then be rewritten without re-verification. With 100
registered queries and a 50-row window this forces the window to rotate
every round, alternating the two halves so no query goes more than one
round without a hard driver row."""

from __future__ import annotations

import glob
import json
import os
import re

DRIVER_WINDOW = 50
RECENT_ROUNDS = 2
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recent_green() -> set[str]:
    """Green queries in the union of the two highest-numbered rounds."""
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    paths.sort(key=lambda p: int(
        re.search(r"_r(\d+)", os.path.basename(p)).group(1)))
    green: set[str] = set()
    for path in paths[-RECENT_ROUNDS:]:
        with open(path) as f:
            rec = json.load(f)
        green |= {name for name, row in rec.items()
                  if row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match") and row.get("err") is None}
    return green


def _latest_round() -> int:
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not paths:
        return 0
    return max(int(re.search(r"_r(\d+)", os.path.basename(p)).group(1))
               for p in paths)


def _latest_green() -> set[str]:
    """Green queries in the single highest-numbered round only."""
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not paths:
        return set()
    latest = max(paths, key=lambda p: int(
        re.search(r"_r(\d+)", os.path.basename(p)).group(1)))
    with open(latest) as f:
        rec = json.load(f)
    return {name for name, row in rec.items()
            if row.get("rows_match") and row.get("schema_match")
            and row.get("hash_match") and row.get("err") is None}


def test_every_query_windowed_or_recently_green():
    from relationaldecomposition_spark.queries import QUERIES

    window = set(list(QUERIES)[:DRIVER_WINDOW])
    uncovered = set(QUERIES) - window - _recent_green()
    assert not uncovered, (
        f"queries with no green row in the last {RECENT_ROUNDS} CORRECTNESS "
        f"rounds and outside the first-{DRIVER_WINDOW} window: "
        f"{sorted(uncovered)}")


def test_unchecked_queries_inside_the_window():
    """Queries NOT green in the two most recent driver rounds must sit
    inside the first-50 window so the next driver run verifies them."""
    from relationaldecomposition_spark.queries import QUERIES

    green = _recent_green()
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    stranded = [k for k in QUERIES if k not in green and k not in window]
    assert not stranded, f"unchecked queries outside the window: {stranded}"


def test_rotation_debt_bounded():
    """Anything green ONLY in round r{N-1} (i.e. rotated out of r{N}) must
    be inside the current window, so the upcoming driver round re-verifies
    it and no query's latest hard row ever ages past one round.

    Round-aware (round-6 judge fix): the check is meaningful only while the
    window constant is AHEAD of the latest CORRECTNESS file (mid-round,
    after the round-start rotation). The moment the driver drops
    CORRECTNESS_r{N}, the debt it creates belongs to the r{N+1} window,
    which by definition does not exist until the next round starts — so the
    assertion is skipped in that state. It instead goes red exactly when
    the builder FORGETS to rotate: a window round number BEHIND the latest
    CORRECTNESS round fails unconditionally."""
    from relationaldecomposition_spark.queries import QUERIES, WINDOW_ROUND

    latest = _latest_round()
    assert WINDOW_ROUND >= latest, (
        f"window constant targets round {WINDOW_ROUND} but "
        f"CORRECTNESS_r{latest:02d}.json exists — rotate _WINDOW_ROUND"
        f"{latest + 1} before doing anything else this round")
    if WINDOW_ROUND == latest:
        # Between-rounds state: the driver just recorded this window's own
        # round. Rotation debt is owed to the not-yet-defined next window.
        return
    # restrict to still-registered queries: a RETIRED query (removed from
    # the registry, e.g. o02 in round 10) owes no re-verification — the
    # union bar is over registered queries only
    stale = (_recent_green() - _latest_green()) & set(QUERIES)
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    aging = sorted(stale - window)
    assert not aging, (
        f"queries whose only green row is one round old sit outside the "
        f"window and would age past the r{{N}} ∪ r{{N-1}} bar: {aging}")


def test_oracles_subset_and_aligned():
    from relationaldecomposition_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    # oracle order follows query order for the shared keys
    q_order = [k for k in QUERIES if k in ORACLES]
    assert list(ORACLES) == q_order


def test_window_list_is_exactly_fifty_unique():
    """A duplicate in the window constant would silently shrink the
    first-50 head (dict reorder dedups), letting an unintended query
    into the driver's checked slice."""
    from relationaldecomposition_spark import queries as q

    window = getattr(q, f"_WINDOW_ROUND{q.WINDOW_ROUND}")
    assert len(window) == DRIVER_WINDOW
    assert len(set(window)) == DRIVER_WINDOW
    assert list(q.QUERIES)[:DRIVER_WINDOW] == window
