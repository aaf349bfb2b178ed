"""Driver-window invariant: the correctness gate records only the first
~50 entries of ``queries()`` in dict order. Every registered query must
therefore be either (a) inside the current first-50 window or (b) already
hard-verified in the LATEST driver round — a green row in the
highest-numbered CORRECTNESS_r*.json. (Older rounds don't count: round 4
showed a query can be green in r03 for an old implementation and then be
rewritten without re-verification — the verdict's bar is
"CORRECTNESS_r{N} ∪ CORRECTNESS_r{N-1} covers all".) This pins the
round-5 fix for the finding that 30 operators had never received a driver
row."""

from __future__ import annotations

import glob
import json
import os
import re

DRIVER_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_green() -> set[str]:
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


def test_every_query_windowed_or_green_in_latest_round():
    from relationaldecomposition_spark.queries import QUERIES

    window = set(list(QUERIES)[:DRIVER_WINDOW])
    uncovered = set(QUERIES) - window - _latest_green()
    assert not uncovered, (
        f"queries with no green row in the latest CORRECTNESS round and "
        f"outside the first-{DRIVER_WINDOW} window: {sorted(uncovered)}")


def test_unchecked_queries_inside_the_window():
    """Queries that are NOT green in the latest driver round must sit inside
    the first-50 window so the next driver run verifies them."""
    from relationaldecomposition_spark.queries import QUERIES

    green = _latest_green()
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    stranded = [k for k in QUERIES if k not in green and k not in window]
    assert not stranded, f"unchecked queries outside the window: {stranded}"


def test_oracles_subset_and_aligned():
    from relationaldecomposition_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    # oracle order follows query order for the shared keys
    q_order = [k for k in QUERIES if k in ORACLES]
    assert list(ORACLES) == q_order
