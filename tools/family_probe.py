"""Bench-context family probe: run a list of registered queries in ONE
fresh JVM with bench.py's warmups, 2 runs each (min reported), engine
metrics from the UI REST API — the committed-sidecar methodology on an
arbitrary row subset (guide §1: measure in the context you compare to).

Usage: python tools/family_probe.py q_a,q_b,... [sf_dir] [baseline.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = sys.argv[1].split(",")
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
BASE = sys.argv[3] if len(sys.argv) > 3 else None


def main():
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    bench = importlib.import_module("bench")
    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    base_wall, base_cpu = {}, {}
    if BASE:
        for p in BASE.split(","):
            d = json.load(open(p))
            for q, w in d["queries"].items():
                if q not in base_wall or w < base_wall[q]:
                    base_wall[q] = w
            for q, m in d["engine_metrics"].items():
                c = m["executor_cpu_time_ns"] / 1e9
                if q not in base_cpu or c < base_cpu[q]:
                    base_cpu[q] = c

    spark = get_spark("family-probe")
    for warm in ("q_tpch_q3", "q_dedup_minhash", "q_agg_cube", "q_map_pandas"):
        QUERIES[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    metrics = bench.StageMetrics(spark)
    metrics.advance()

    print(
        f"{'query':36s} {'wall':>7s} {'cpu':>7s} {'shufMB':>7s} {'stg':>4s}"
        f" | {'b.wall':>7s} {'b.cpu':>7s} {'w.ratio':>7s}",
        flush=True,
    )
    for name in NAMES:
        walls, cpus, best = [], [], None
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.perf_counter() - t0)
            m = metrics.advance()
            cpus.append(m["executor_cpu_time_ns"] / 1e9)
            if best is None or cpus[-1] < best["executor_cpu_time_ns"] / 1e9:
                best = m
        w, c = min(walls), min(cpus)
        bw, bc = base_wall.get(name), base_cpu.get(name)
        extra = (
            f" | {bw:7.2f} {bc:7.2f} {w / bw:7.2f}" if bw else " |       -"
        )
        print(
            f"{name:36s} {w:7.2f} {c:7.2f}"
            f" {best['shuffle_read_bytes'] / 1e6:7.1f} {best['n_stages']:4d}"
            + extra,
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
