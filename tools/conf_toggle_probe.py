"""Same-JVM A/B for a runtime SQL conf (optimization round 12).

Interleaves off/on runs of each named query in ONE session with the
given conf toggled between runs — box drift and JIT hit both variants.

Usage:
  python tools/conf_toggle_probe.py CONF_KEY q_a [q_b ...] [--runs N] [--sf DIR]
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
    conf_key, *names = args

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from bench import StageMetrics
    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("conf-toggle")
    for warm in ("q_tpch_q3", "q_map_pandas"):
        QUERIES[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    metrics = StageMetrics(spark)
    metrics.advance()

    def run_variant(name: str, on: bool):
        spark.conf.set(conf_key, "true" if on else "false")
        try:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
        finally:
            spark.conf.unset(conf_key)
        eng = metrics.advance()
        return wall, eng["executor_run_time_ms"] / 1e3, eng["n_stages"]

    for name in names:
        best = {}
        print(f"== {name} ({conf_key}) ==", flush=True)
        for r in range(runs):
            for on in (False, True):
                w, e, ns = run_variant(name, on)
                print(
                    f"  {'on ' if on else 'off'} run{r + 1}: wall={w:6.2f}s"
                    f" engine={e:7.2f}s stages={ns}",
                    flush=True,
                )
                if on not in best or w < best[on][0]:
                    best[on] = (w, e, ns)
        print(
            f"  best-of-{runs}: off {best[False][0]:.2f}s ->"
            f" on {best[True][0]:.2f}s ({best[True][0] / best[False][0]:.2f}x)"
            f"  stages {best[False][2]} -> {best[True][2]}",
            flush=True,
        )

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
