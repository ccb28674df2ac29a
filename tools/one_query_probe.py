"""Run ONE registered query N times to the noop sink in a fresh JVM and
print wall + engine metrics per run (guide §1: isolate before blaming).

Usage: python tools/one_query_probe.py q_name [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QNAME = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def main():
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    bench = importlib.import_module("bench")
    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    spark = get_spark("one-query-probe")
    metrics = bench.StageMetrics(spark)
    metrics.advance()
    for i in range(REPS):
        t0 = time.perf_counter()
        QUERIES[QNAME](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        m = metrics.advance()
        print(
            f"run{i}: wall {wall:7.2f}s  ert {m['executor_run_time_ms'] / 1e3:7.2f}s"
            f"  cpu {m['executor_cpu_time_ns'] / 1e9:7.2f}s"
            f"  gc {m['jvm_gc_time_ms'] / 1e3:5.1f}s"
            f"  shufMB {m['shuffle_read_bytes'] / 1e6:7.1f}"
            f"  stages {m['n_stages']}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
