"""Re-confirmation rotation helper (VERDICT r05 item 1).

Once every registered query has a green driver row, the 50-slot window
becomes re-confirmation budget and the question shifts from "what was
never checked" (tools/rotation.py) to "whose latest green row is
OLDEST". This tool reads every CORRECTNESS_r*.json, keeps the LATEST
green round per query, and prints all registered queries oldest-first
(ties broken by registration order) plus a ready-to-paste
DRIVER_PRIORITY tuple of the first 50.

Usage: python tools/rotation_age.py [N]   (N = tuple size, default 50)

NOTE (round 8): _apply_driver_priority now derives the oldest-first
ordering from the CORRECTNESS union ITSELF — DRIVER_PRIORITY is only
the manual code-changed re-front list, and no tuple needs regenerating.
This tool remains the REPORT (which tiers are stale, what the window
will be); its printed tuple is only needed if the structural ordering
ever has to be overridden wholesale.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only checks
            ):
                latest[name] = max(rnd, latest.get(name, 0))

    reg = list(QUERIES)
    pending = [n for n in reg if n not in latest]
    if pending:
        print(
            f"# {len(pending)} queries have NO green row — use "
            "tools/rotation.py; they auto-front regardless",
            file=sys.stderr,
        )
    ordered = sorted(
        (n for n in reg if n in latest),
        key=lambda n: (latest[n], reg.index(n)),
    )
    for n in ordered:
        print(f"r{latest[n]:02d}  {n}", file=sys.stderr)
    print("DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in (pending + ordered)[:n_slots]:
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
