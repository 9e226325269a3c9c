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


# ---------------------------------------------------------------------
# Fixture non-degeneracy gate (VERDICT r6 #2): the hash-compare
# correctness gate is blind to a query that matches its oracle on the
# EMPTY (or near-empty) set — exactly how dedup_editdistance_join and
# geo_trajectory_similarity shipped 0-row driver rows in r4, and how
# dedup_editdistance_join silently went 8-row-thin at sf0.1 under the
# r6 fixed df cap. These floors make that failure mode loud at EVERY
# shipped sf: a future fixture tweak or testdata regeneration that
# drives any of these below its floor fails CI instead of
# hash-matching a degenerate result. Floors are ~half the measured
# row counts (trajectory 60/3624/26238, editdistance 94/81/822 —
# the r9 adaptive gate recovered 3 sf0.1 rows the fixed gate lost,
# redact_pii 500/500/5000) — loose enough for benign drift, tight
# enough that "the join found nothing" can never pass.
# ---------------------------------------------------------------------

import pytest  # noqa: E402

_MIN_ROWS = {
    "geo_trajectory_similarity": {
        "0.001": 30, "0.01": 1500, "0.1": 10000,
    },
    "dedup_editdistance_join": {
        "0.001": 40, "0.01": 40, "0.1": 300,
    },
    # measured 110/110/1109 (r9): 50/50/500 planted twins plus the
    # deterministic natural near-pairs the Zipf-like keys produce
    "dedup_editdistance_absolute": {
        "0.001": 50, "0.01": 50, "0.1": 500,
    },
    "text_redact_pii": {
        "0.001": 200, "0.01": 200, "0.1": 2000,
    },
}


@pytest.mark.parametrize("name", sorted(_MIN_ROWS))
@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_redesigned_fixture_is_non_degenerate(spark, name, sf):
    import os

    sf_dir = f"/root/testdata/sf{sf}"
    if not os.path.isdir(sf_dir):
        # same convention as the sf1 fuzz module: a missing scale
        # tier skips instead of erroring (the driver always ships all
        # three, so in CI this gate is always live) — UNLESS the
        # environment explicitly points at this tier, in which case a
        # missing directory is a misconfiguration and skipping would
        # let the degeneracy guard pass vacuously (ADVICE r7)
        env = os.environ.get("SPARK_GRAFT_SF_DIR")
        if env and os.path.normpath(env) == os.path.normpath(sf_dir):
            pytest.fail(
                f"SPARK_GRAFT_SF_DIR={env} names this tier but the "
                "directory does not exist — refusing to skip the "
                "non-degeneracy gate on an explicitly configured tier"
            )
        pytest.skip(f"{sf_dir} not present")
    floor = _MIN_ROWS[name][sf]
    n = Q.queries()[name](spark, sf_dir).count()
    assert n >= floor, (
        f"{name} returned {n} rows at sf{sf} (floor {floor}) — the "
        "fixture has gone degenerate; the hash gate alone cannot see "
        "this (it would happily match a thin or empty oracle)"
    )


def test_zipf_key_expr_pinned_cross_engine(spark):
    """dedup_editdistance_absolute's deterministic Zipf-like keys
    must be IDENTICAL in Spark and DuckDB — the oracle compares
    levenshtein distances over them, so one divergent character is a
    silent hash mismatch. Pins three exact keys (independently
    derived in DuckDB) against the Spark expression, so a regression
    in the integer recipe (md5 windowing, dyadic rank mixing, lpad)
    fails loudly here rather than as an opaque oracle diff."""
    from pyspark.sql import functions as F

    from h3ron_spark.queries_h3 import _zipf_key_expr

    want = {
        0: "t8175t0031t0089t0002t0172t0007t0046t0000",
        7: "t0082t0212t0032t0000t0050t0004t0367t0195",
        123456789: "t0079t0096t0057t0000t0000t0008t1742t0000",
    }
    got = {
        r["doc_id"]: r["s"]
        for r in spark.createDataFrame(
            [(k,) for k in want], "doc_id long"
        )
        .select("doc_id", F.expr(_zipf_key_expr()).alias("s"))
        .collect()
    }
    assert got == want
    # every key is exactly 40 chars (the gram window and the twin
    # mutation offsets depend on it)
    assert all(len(s) == 40 for s in got.values())


def test_rotation_plan_invariants():
    """scripts/rotation_plan.py mechanizes the hand-rotated window
    policy (it caught a wrong hand-derived r11 cohort in r10 — see
    NOTES_r10). Pin the round-independent invariants: every oracle is
    tracked or flagged, ages partition the oracle set, the due cohort
    is exactly the age-MAX set, and a non-overflowing proposal is a
    valid next window (<= budget, deduped, oracled, due-covering).

    Phase semantics (ADVICE r10): plan() detects whether the
    installed window has ALREADY run (its key set is contained in the
    newest CORRECTNESS artifact — the post-round worktree state) and
    plans from that round instead of a fictitious next one, so this
    test is meaningful and green at BOTH round phases — before the
    fix it went red between the driver's snapshot commit and the next
    round's rotation commit (the r8 cohort read a bogus age 3)."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import rotation_plan as RP

    p = RP.plan(repo=repo)
    oracles = set(Q.oracles())
    hist = p["age_histogram_after_this_round"]
    assert sum(hist.values()) + len(p["untracked_oracles"]) == len(oracles)
    # the current window itself is age 0 after this round
    assert hist.get(0, 0) >= len(Q._DRIVER_ORDER_FIRST) - len(
        p["untracked_oracles"]
    )
    # max-age-2: nothing may be OLDER than the due age already
    assert max(hist) <= RP.MAX_AGE, (
        "an oracle is already past max age — the rotation fell behind"
    )
    w = p["proposed_next_window"]
    assert len(w) <= RP.BUDGET
    assert len(set(w)) == len(w)
    assert all(n in oracles for n in w)
    if not p["overflow"]:
        assert set(p["due_next_round"]) <= set(w), (
            "proposal drops a due entry without declaring overflow"
        )


def test_rotation_plan_phase_detection(tmp_path, monkeypatch):
    """plan() must treat the installed window as already-run when the
    newest CORRECTNESS artifact contains its whole key set (post-round
    worktree: snapshot committed, rotation not yet), and as the
    upcoming round's window otherwise (normal mid-round state). The
    r10 post-round worktree hit the un-detected case: the window was
    double-counted as r11's run and the r8 cohort computed age 3."""
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import rotation_plan as RP

    window = list(Q._DRIVER_ORDER_FIRST)
    others = [n for n in Q.oracles() if n not in window]

    # phase A: newest artifact IS the installed window's own run
    row = {"rows_match": True}
    with open(tmp_path / "CORRECTNESS_r05.json", "w") as f:
        json.dump({n: row for n in window}, f)
    p = RP.plan(repo=str(tmp_path))
    assert p["this_round"] == 5
    assert p["next_round"] == 6
    # the window ages from its own recorded round: nothing at age > 0
    assert set(p["age_histogram_after_this_round"]) == {0}

    # phase B: a newer artifact covers a DIFFERENT set -> the
    # installed window is the upcoming round's
    with open(tmp_path / "CORRECTNESS_r06.json", "w") as f:
        json.dump({n: row for n in others[:10]}, f)
    p = RP.plan(repo=str(tmp_path))
    assert p["this_round"] == 7
    assert p["next_round"] == 8
