"""Measure the Z-order layout's bytes-read win on the 2-D rectangle
probe (the q_zorder_layout predicate) vs a natural-order layout.

Writes events twice at $SPARK_GRAFT_SF_DIR (default sf0.1) — once in
arrival order, once Morton-clustered on (user_id, t_us) — then runs the
identical probe aggregation on both and reports per-layout engine
metrics (input bytes, executor CPU) from the UI REST API. The ratio is
the artifact PERF.md records: it is what row-group min/max pruning on
BOTH dimensions at once is worth. Run:

    SPARK_GRAFT_UI=1 python tools/zorder_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import StageMetrics  # noqa: E402
from incubator_flink_old_spark import get_spark  # noqa: E402
from incubator_flink_old_spark.queries._util import dsum  # noqa: E402
from incubator_flink_old_spark.queries.llm_ops12 import (  # noqa: E402
    _T_HI,
    _T_LO,
    _U_HI,
    _U_LO,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    spark = get_spark("zorder-probe")
    import tempfile

    from incubator_flink_old_spark.operators.layout import write_zordered
    from incubator_flink_old_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "event_type",
        "value",
    )
    # SCALE=16 replicates the table (shifted event_ids, same user/time
    # density) to show the pruning RATIO improves as row-group count
    # grows — the property the 100 TB claim rests on: finer curve
    # regions converge the bytes-read fraction to the probe's area
    # fraction, while a natural layout stays at ~1.0. N_FILES sizes the
    # layout (more files = finer pruning granularity).
    scale = int(os.environ.get("SCALE", "1"))
    n_files = int(os.environ.get("N_FILES", "16"))
    if scale > 1:
        n = ev.count()
        ev = (
            ev.crossJoin(spark.range(scale).withColumnRenamed("id", "__r"))
            .withColumn("event_id", F.col("event_id") + F.col("__r") * n)
            .drop("__r")
        )
    minu, maxu, mint, maxt = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("t_us"), F.max("t_us")
    ).collect()[0]
    base = tempfile.mkdtemp(prefix="t2_zprobe_")
    nat_path, z_path = base + "/natural", base + "/zorder"
    # natural layout: same file count, arrival order
    ev.repartition(n_files).write.mode("overwrite").parquet(nat_path)
    write_zordered(
        ev,
        z_path,
        dims=[(F.col("user_id"), minu, maxu), (F.col("t_us"), mint, maxt)],
        bits=16,
        n_files=n_files,
    )
    lo_u = minu + (maxu - minu) * _U_LO // 100
    hi_u = minu + (maxu - minu) * _U_HI // 100
    lo_t = mint + (maxt - mint) * _T_LO // 100
    hi_t = mint + (maxt - mint) * _T_HI // 100

    def probe(path: str):
        stored = spark.read.parquet(path)
        return (
            stored.filter(
                (F.col("user_id") >= F.lit(lo_u))
                & (F.col("user_id") <= F.lit(hi_u))
                & (F.col("t_us") >= F.lit(lo_t))
                & (F.col("t_us") <= F.lit(hi_t))
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum("value", "total_value"),
            )
        )

    metrics = StageMetrics(spark)
    results = {}
    for name, path in (("natural", nat_path), ("zorder", z_path)):
        # warm the footer/metadata cache out of the measurement
        probe(path).collect()
        metrics.advance()
        rows = probe(path).collect()
        eng = metrics.advance()
        results[name] = {
            "rows": sorted((r.event_type, r.n_events) for r in rows),
            "input_bytes": eng["input_bytes"],
            "executor_run_time_ms": eng["executor_run_time_ms"],
        }
    assert results["natural"]["rows"] == results["zorder"]["rows"]
    nat_b, z_b = (
        results["natural"]["input_bytes"],
        results["zorder"]["input_bytes"],
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir, "scale": scale, "n_files": n_files,
                "natural": results["natural"],
                "zorder": results["zorder"],
                "bytes_ratio": round(z_b / nat_b, 4) if nat_b else None,
            }
        )
    )


if __name__ == "__main__":
    main()
