"""Driver-correctness rotation helper (COVERAGE.md §Driver-correctness
rotation).

The round driver verifies only the FIRST 50 registered queries. This tool
reads every CORRECTNESS_r*.json in the repo root, unions the green rows,
and prints the queries that still lack one — i.e. exactly the names that
belong at the front of ``queries.DRIVER_PRIORITY`` next round, in current
registration order, plus a ready-to-paste tuple literal.

Usage: python tools/rotation.py
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
    green: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only checks
            ):
                green.add(name)
        print(f"{path}: {len(rows)} rows", file=sys.stderr)

    pending = [n for n in QUERIES if n not in green]
    print(f"# {len(QUERIES)} registered, {len(green)} driver-green, "
          f"{len(pending)} pending", file=sys.stderr)
    if not pending:
        print("# all queries have a green driver row — rotation complete",
              file=sys.stderr)
    print("DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in pending:
        print(f'    "{n}",')
    print(")")
    if len(pending) > 50:
        print(f"# NOTE: {len(pending)} pending > 50 driver slots — "
              f"the last {len(pending) - 50} roll to the round after",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
