"""Guard the driver-sweep window invariant (round-3 verdict item 2 /
round-4 refinement / round-5 backfill rule): the driver checks the FIRST
~50 entries of ``queries()`` per round, so those 50 slots must go to the
queries that need driver evidence most —

1. every query with no driver-green row in any committed
   CORRECTNESS_r{N}.json occupies the head of the window (when more such
   queries exist than slots, the whole window must be never-green);
2. once all never-green queries fit, the remaining slots backfill with
   the queries whose LAST driver-green row is oldest (stalest evidence
   refreshed first) — no query outside the window may be staler than a
   backfilled one inside it.
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _last_green_round() -> dict:
    last = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def test_window_prioritizes_never_green_then_stalest():
    from corsearch_project_spark.queries import spark_queries

    ordered = list(spark_queries())
    last = _last_green_round()
    window = ordered[:WINDOW]
    never = [n for n in ordered if n not in last]

    if len(never) >= WINDOW:
        wasted = [n for n in window if n in last]
        assert not wasted, (
            f"{len(wasted)} window slots wasted on already-driver-green "
            f"queries while never-green ones wait: {wasted}"
        )
        return

    # All never-green queries must sit at the head of the window.
    head = window[: len(never)]
    assert set(head) == set(never), (
        f"window head must be exactly the never-green set; "
        f"missing={sorted(set(never) - set(head))} "
        f"extra={sorted(set(head) - set(never))}"
    )
    # Backfill slots must hold the stalest green evidence: nothing
    # outside the window may have an older last-green round than a
    # backfilled query inside it.
    backfill = window[len(never):]
    outside = [n for n in ordered[WINDOW:] if n in last]
    if backfill and outside:
        assert max(last[n] for n in backfill) <= min(last[n] for n in outside), (
            "a query outside the window has staler driver evidence than "
            "a backfilled one inside it"
        )


def test_sweep_lists_are_registry_consistent():
    from corsearch_project_spark.queries import (
        REGISTRY,
        _SWEEP_FIRST,
        _SWEEP_OVERFLOW,
    )

    assert len(_SWEEP_FIRST) == WINDOW
    unknown = [n for n in _SWEEP_FIRST + _SWEEP_OVERFLOW if n not in REGISTRY]
    assert not unknown, f"sweep lists name unregistered queries: {unknown}"
    dupes = [
        n for n in set(_SWEEP_FIRST) & set(_SWEEP_OVERFLOW)
    ]
    assert not dupes, f"queries listed in both sweep lists: {dupes}"


def test_sweep_lists_cover_registry():
    from corsearch_project_spark.queries import (
        REGISTRY,
        _SWEEP_FIRST,
        _SWEEP_OVERFLOW,
    )

    listed = set(_SWEEP_FIRST) | set(_SWEEP_OVERFLOW)
    missing = [n for n in REGISTRY if n not in listed]
    assert not missing, (
        f"registry queries absent from both sweep lists (their sweep "
        f"position is accidental registration order): {missing}"
    )
