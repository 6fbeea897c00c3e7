"""Guard the driver-sweep window invariant (round-3 verdict item 2 /
round-4 refinement): the driver checks the FIRST ~50 entries of
``queries()`` per round, so the first 50 must be exactly queries that have
never received a driver-green row in any committed CORRECTNESS_r{N}.json —
otherwise a sweep slot is wasted re-verifying an already-green query while
a never-swept one stays uncovered.
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _green_rows() -> set:
    names = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match"):
                names.add(name)
    return names


def test_window_holds_only_never_swept_queries():
    from corsearch_project_spark.queries import spark_queries

    ordered = list(spark_queries())
    green = _green_rows()
    window = ordered[:WINDOW]
    already = [n for n in window if n in green]
    assert not already, (
        f"{len(already)} window slots wasted on already-driver-green "
        f"queries: {already}"
    )


def test_window_is_full_when_enough_candidates_exist():
    from corsearch_project_spark.queries import spark_queries

    ordered = list(spark_queries())
    green = _green_rows()
    never = [n for n in ordered if n not in green]
    # If more never-swept queries exist than slots, the window must be
    # entirely never-swept; any shortfall means ordering lost a slot.
    if len(never) >= WINDOW:
        assert ordered[:WINDOW] == never[:WINDOW] or all(
            n not in green for n in ordered[:WINDOW]
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
