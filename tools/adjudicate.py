"""Isolated steady-state re-measurement for bench regression
adjudication (the q_sim_lsh_pairs / q_cc_sizes protocol, PERF.md rounds
5-6): fresh session, q_tpch_q3 + q_map_pandas warmup, N stage-attributed
runs of each named query at sf0.1, printing per run the engine run-time,
CPU time, GC, shuffle-read bytes and stage count — identical shuffle
bytes + stage count across runs means the plan and data volume did not
move, and the run-time floor is the steady-state figure to compare with
the sidecar.

Usage: python tools/adjudicate.py q_a [q_b ...] [--runs N] [--sf DIR]
Run on a QUIET box only (concurrent load inflates everything ~1.5x).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 4
    sf_dir = "/root/testdata/sf0.1"
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    if not names:
        sys.exit("usage: python tools/adjudicate.py q_a [q_b ...] [--runs N]")

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from bench import StageMetrics
    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("adjudicate")
    for warm in ("q_tpch_q3", "q_map_pandas"):
        QUERIES[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    metrics = StageMetrics(spark)
    metrics.advance()  # consume warmup stages

    for name in names:
        print(f"== {name} (sf_dir={sf_dir}, {runs} runs) ==", flush=True)
        for r in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            m = metrics.advance()
            print(
                f"  run{r + 1}: wall={wall:.2f}s "
                f"engine={m['executor_run_time_ms'] / 1000:.2f}s "
                f"cpu={m['executor_cpu_time_ns'] / 1e9:.2f}s "
                f"gc={m['jvm_gc_time_ms']}ms "
                f"shuffle_read={m['shuffle_read_bytes']:,} "
                f"stages={m['n_stages']}",
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
