"""Optimization round 12: same-JVM A/B for the _spread_narrow rebalance.

Builds each named query twice in ONE session — once with
operators.text._spread_narrow monkeypatched to identity ("off", the old
plan) and once live ("on") — and interleaves noop-sink runs
off/on/off/on so box drift and JIT hit both variants equally. The
comparison is within-process; absolute walls on a noisy box are
meaningless but the off/on ratio is stable.

Usage: python tools/spread_toggle_probe.py q_a [q_b ...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    runs = 2
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

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from bench import StageMetrics
    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.operators import text as text_ops
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("spread-toggle")
    for warm in ("q_tpch_q3", "q_dedup_minhash", "q_map_pandas"):
        QUERIES[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    metrics = StageMetrics(spark)
    metrics.advance()

    real_spread = text_ops._spread_narrow

    def run_variant(name: str, spread_on: bool) -> tuple[float, float, float]:
        text_ops._spread_narrow = real_spread if spread_on else (lambda df: df)
        try:
            # Construction INSIDE the timer — bench methodology (several
            # operators do eager checkpoints at build time).
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
        finally:
            text_ops._spread_narrow = real_spread
        eng = metrics.advance()
        return (
            wall,
            eng["executor_run_time_ms"] / 1e3,
            eng["executor_cpu_time_ns"] / 1e9,
        )

    for name in names:
        best: dict[bool, tuple] = {}
        print(f"== {name} ==", flush=True)
        for r in range(runs):
            for on in (False, True):
                w, e, c = run_variant(name, on)
                lbl = "on " if on else "off"
                print(
                    f"  spread {lbl} run{r + 1}: wall={w:6.2f}s"
                    f" engine={e:7.2f}s cpu={c:7.2f}s",
                    flush=True,
                )
                if on not in best or w < best[on][0]:
                    best[on] = (w, e, c)
        wo, wn = best[False][0], best[True][0]
        print(
            f"  best-of-{runs}: off {wo:.2f}s -> on {wn:.2f}s"
            f"  ({wn / wo:.2f}x)",
            flush=True,
        )

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
