"""CLI front-end (SURVEY §3.3: CliFrontend run/info/list parity).

    python -m incubator_flink_old_spark list
    python -m incubator_flink_old_spark run q_tpch_q3 [--sf-dir DIR] [--show N]
    python -m incubator_flink_old_spark info q_tpch_q3 [--mode formatted]

``run`` executes a registry query and prints rows; ``info`` prints the
physical plan (the reference's plan-JSON preview equivalent).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="incubator_flink_old_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    p_run = sub.add_parser("run", help="run a query and print rows")
    p_run.add_argument("name")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--show", type=int, default=20)

    p_info = sub.add_parser("info", help="print the physical plan")
    p_info.add_argument("name")
    p_info.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_info.add_argument("--mode", default="formatted")

    p_oracle = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_oracle.add_argument("name")

    args = parser.parse_args(argv)

    from incubator_flink_old_spark.queries import ORACLES, QUERIES, load_all_queries

    load_all_queries()

    if args.cmd == "list":
        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:32s} [{kind}]")
        return 0

    if args.name not in QUERIES:
        print(f"unknown query: {args.name!r} (see `list`)", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        if args.name not in ORACLES:
            print(f"{args.name} is rows-only (no oracle)", file=sys.stderr)
            return 1
        print(ORACLES[args.name])
        return 0

    from incubator_flink_old_spark import get_spark

    spark = get_spark("cli")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.cmd == "run":
        df.show(args.show, truncate=False)
    else:
        from incubator_flink_old_spark.plans import explain_str

        print(explain_str(df, args.mode))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
