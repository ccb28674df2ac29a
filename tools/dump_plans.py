"""Dump .explain("formatted") for named queries to files — the
optimization-round evidence artifacts (plans/rNN/<query>_{before,after}.txt).

Usage: python tools/dump_plans.py OUTDIR SUFFIX q_a [q_b ...] [--sf DIR]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    outdir, suffix, *names = args
    os.makedirs(outdir, exist_ok=True)

    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("dump-plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — record the failure inline
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
