"""Order-independent result digest per query — the engine-vs-engine
identity check for optimization waves at SFs where the DuckDB oracle
replay is too slow (the sf0.1 pair family: multi-million-row md5
recomputation in DuckDB runs for hours).

For each named query prints one line:
    <query> <row_count> <digest>
digest = sum(xxhash64(canonical row string)) mod 2^63 over all rows —
order-independent, partitioning-independent; doubles are canonicalized
via repr-style formatting so -0.0/0.0 and float noise don't alias
(engines are expected bit-identical; this only canonicalizes stringly).

Run the same command in two worktrees (old/new code) and diff the
output: identical lines == identical multisets of rows.

Usage: python tools/result_hash.py q_a [q_b ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from pyspark.sql import functions as F

    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("result-hash")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            # explicit NULL sentinel: concat_ws SKIPS nulls, which would
            # alias ("a", NULL, "b") with ("a", "b", NULL)
            cols = [
                F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
                for c in df.columns
            ]
            digest = df.select(
                F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h")
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("h") % F.lit(2**61)).alias("s"),
            )
            row = digest.collect()[0]
            print(f"RESULT {name} n={row['n']} d={row['s']}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"RESULT {name} ERROR {exc}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
