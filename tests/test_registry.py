"""Registry invariants: the driver contract the rounds depend on.

The round driver verifies only the FIRST 50 registered queries, so the
rotation discipline (COVERAGE.md) must hold structurally: every
registered query either already has a green CORRECTNESS_r* row or sits
inside the first-50 window. A new query registered without rotating it
forward would silently never get driver-checked — these tests make that
a deterministic failure instead.
"""

from __future__ import annotations

import glob
import json
import os

from incubator_flink_old_spark.queries import (
    DRIVER_PRIORITY,
    ORACLES,
    QUERIES,
    load_all_queries,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_rows() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            ):
                green.add(name)
    return green


def test_every_query_has_an_oracle():
    load_all_queries()
    assert set(QUERIES) == set(ORACLES), (
        "rows-only queries reintroduced: "
        f"{sorted(set(QUERIES) - set(ORACLES))}"
    )


def test_driver_priority_names_exist():
    load_all_queries()
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"


def test_driver_window_wastes_no_slot_on_green_queries():
    """The driver verifies the first 50 registered queries per round.
    When more than 50 lack a green row, the window cannot cover them all
    — the rotation invariant is then: NO window slot is spent on an
    already-green query while an unchecked one waits outside (stranding
    is allowed only as overflow, never as waste)."""
    load_all_queries()
    green = _green_rows()
    window = list(QUERIES)[:50]
    stranded = [n for n in QUERIES if n not in green and n not in set(window)]
    wasted = [n for n in window if n in green]
    assert not (stranded and wasted), (
        f"window slots wasted on green queries {wasted} while unchecked "
        f"queries are stranded outside: {stranded}"
    )
    unchecked_total = sum(1 for n in QUERIES if n not in green)
    assert len(stranded) == max(0, unchecked_total - 50)


def test_green_rechecks_rotate_oldest_first():
    """VERDICT r07 item 1(b) tripwire: the green portion of the registry
    ordering must be the STALEST queries first, derived from the
    CORRECTNESS union itself — i.e. first 50 = un-green queries +
    DRIVER_PRIORITY code-changed re-fronts + the stalest remaining
    greens, with no manual stale-tier tuple to regenerate each round."""
    from incubator_flink_old_spark.queries import _driver_latest

    load_all_queries()
    latest = _driver_latest()
    reg = list(QUERIES)
    reg_pos = {n: i for i, n in enumerate(reg)}
    # Skip un-green names and manual re-fronts; what remains must be
    # sorted by (latest green round, registration position).
    manual = {n for n in DRIVER_PRIORITY if n in QUERIES}
    tail = [n for n in reg if n in latest and n not in manual]
    keys = [(latest[n], reg_pos[n]) for n in tail]
    assert keys == sorted(keys), (
        "green re-checks are not ordered oldest-latest-row-first; "
        "_apply_driver_priority regressed to a static ordering"
    )
    # And the un-green + manual block must sit strictly before the tail.
    n_front = len(reg) - len(tail)
    front = reg[:n_front]
    assert all(n not in latest or n in manual for n in front), (
        "a green non-re-front query appears before the age-ordered tail"
    )
