"""CI pins for the driver-verification window policy.

The correctness driver verifies the first ~50 oracled queries in
registry order each round (observed budget, CORRECTNESS_r02-r04 are
exactly 50 rows). `_DRIVER_ORDER_FIRST` is the declared window; these
tests make the policy's structural invariants fail loudly instead of
silently burning verification budget:

- exactly 50 entries (the budget — more would push declared entries
  out of the round's verification; fewer wastes slots);
- no duplicates (a dupe burns a slot without adding a row);
- every entry registered AND oracled (a rows-only or unknown name in
  the window displaces an exact-oracle row);
- `queries()` actually orders the window first (the driver consumes
  registry order — if ordering breaks, the rotation plan is fiction).
"""

from __future__ import annotations

from h3ron_spark import queries as Q

WINDOW_BUDGET = 50


def test_window_is_exactly_the_budget():
    assert len(Q._DRIVER_ORDER_FIRST) == WINDOW_BUDGET


def test_window_has_no_duplicates():
    w = Q._DRIVER_ORDER_FIRST
    dupes = {n for n in w if w.count(n) > 1}
    assert not dupes, dupes


def test_window_entries_registered_and_oracled():
    oracles = Q.oracles()
    registry = Q.queries()
    missing = [n for n in Q._DRIVER_ORDER_FIRST if n not in registry]
    assert not missing, f"window names not registered: {missing}"
    unoracled = [n for n in Q._DRIVER_ORDER_FIRST if n not in oracles]
    assert not unoracled, f"window names without oracle: {unoracled}"


def test_registry_order_leads_with_the_window():
    ordered = list(Q.queries())
    assert ordered[:WINDOW_BUDGET] == list(Q._DRIVER_ORDER_FIRST)
