"""Compute the next round's driver-window rotation from artifacts.

The correctness driver replays the first 50 oracled registry names
(`queries._DRIVER_ORDER_FIRST`) each round; the standing policy keeps
every oracle's last driver-verified round at most 2 rounds old
("max-age-2"). This script derives, purely from the committed
CORRECTNESS_r*.json artifacts plus the current window, everything the
hand-written rotation plan in each round's NOTES states:

- the age histogram AFTER the current round's window runs;
- the cohort DUE next round (entries whose age would exceed 2);
- the proposed next window: [touched (names passed on the CLI)] +
  [due cohort, sorted] + [filler from the next-oldest cohort's sorted
  head], trimmed/validated against the 50 budget.

    python scripts/rotation_plan.py [--touched name ...]

Exit code 1 if the composition cannot satisfy the invariant (more due
entries + touched than budget) — the signal to yield touched slots
(the r10 precedent: a touched query with other coverage yields and
re-enters via its own due cohort next round).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET = 50
MAX_AGE = 2


def load_history(repo: str) -> dict[int, set[str]]:
    """round number -> set of oracle names driver-verified that round."""
    hist: dict[int, set[str]] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            hist[int(m.group(1))] = set(json.load(f))
    return hist


def last_green(hist: dict[int, set[str]]) -> dict[str, int]:
    out: dict[str, int] = {}
    for rnd in sorted(hist):
        for name in hist[rnd]:
            out[name] = rnd
    return out


def plan(repo: str = ".", touched: list[str] | None = None) -> dict:
    from h3ron_spark import queries as Q

    touched = list(touched or [])
    oracles = set(Q.oracles())
    window = list(Q._DRIVER_ORDER_FIRST)
    hist = load_history(repo)
    # Phase detection (ADVICE r10): between the driver's end-of-round
    # snapshot commit and the next round's window rotation, the newest
    # CORRECTNESS artifact IS the installed window's own run. Counting
    # that window as a *future* round's run double-ages every older
    # cohort (the r8 cohort read age 3 in the r10 post-round worktree
    # and test_rotation_plan_invariants went red until the rotation
    # landed). If the installed window is a subset of the newest
    # artifact's key set, it has already run — plan from max(hist);
    # otherwise the window is the upcoming round's.
    if hist and set(window) <= hist[max(hist)]:
        this_round = max(hist)
    else:
        this_round = max(hist) + 1 if hist else 1
    green = last_green(hist)

    # the current window runs THIS round
    after = dict(green)
    for name in window:
        after[name] = this_round

    untracked = sorted(oracles - set(after))
    ages = {n: this_round - r for n, r in after.items() if n in oracles}
    histogram = {}
    for a in sorted(set(ages.values())):
        histogram[a] = sum(1 for v in ages.values() if v == a)

    due = sorted(n for n, a in ages.items() if a >= MAX_AGE)
    next_oldest = sorted(n for n, a in ages.items() if a == MAX_AGE - 1)

    touched_extra = [n for n in touched if n in oracles and n not in due]
    proposed = touched_extra + due
    overflow = len(proposed) - BUDGET
    filler = []
    if overflow < 0:
        filler = [n for n in next_oldest if n not in proposed][:-overflow]
        proposed = proposed + filler
    return {
        "this_round": this_round,
        "next_round": this_round + 1,
        "age_histogram_after_this_round": histogram,
        "untracked_oracles": untracked,
        "due_next_round": due,
        "touched_extra": touched_extra,
        "filler": filler,
        "overflow": max(0, overflow),
        "proposed_next_window": proposed[:BUDGET],
    }


def main() -> int:
    argv = sys.argv[1:]
    touched: list[str] = []
    if "--touched" in argv:
        touched = argv[argv.index("--touched") + 1 :]
    p = plan(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             touched=touched)
    print(f"this round: r{p['this_round']} (current window runs now)")
    print(f"age histogram after r{p['this_round']}:",
          ", ".join(f"{v} @ age {k}" for k, v in
                    sorted(p["age_histogram_after_this_round"].items())))
    if p["untracked_oracles"]:
        print("UNTRACKED oracles (never driver-verified):",
              p["untracked_oracles"])
    print(f"\ndue at r{p['next_round']} ({len(p['due_next_round'])}):")
    for n in p["due_next_round"]:
        print("  ", n)
    if p["touched_extra"]:
        print("touched (extra slots):", p["touched_extra"])
    if p["filler"]:
        print(f"filler from the age-1 cohort head ({len(p['filler'])}):",
              p["filler"])
    if p["overflow"]:
        print(f"\nOVERFLOW: {p['overflow']} more candidates than the "
              f"{BUDGET} budget — yield touched slots (r10 precedent) "
              "or the invariant breaks.")
        return 1
    print(f"\nproposed r{p['next_round']} window ({len(p['proposed_next_window'])}):")
    for n in p["proposed_next_window"]:
        print("  ", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
