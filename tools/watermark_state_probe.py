"""Price the watermarked pair-dedup state: run the streaming near-dup
screen at a given SF in BOTH forms — unbounded dropDuplicates vs
watermarked dropDuplicatesWithinWatermark over the in-event-time-order
4-file replay — and report per-batch dedup-state rows and emitted pairs.

The unbounded form's state grows one row per emitted pair forever; the
watermarked form's state is the in-flight horizon (pairs newer than
watermark). Usage: python tools/watermark_state_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def run(event_time):
    from pyspark.sql import functions as F

    from incubator_flink_old_spark.operators.text import (
        streaming_neardup_screen,
    )
    from incubator_flink_old_spark.queries._util import t
    from incubator_flink_old_spark.queries.llm_ops28 import _D_MOD, _D_REM
    from incubator_flink_old_spark.streaming import run_stream_to_memory

    spark = globals()["spark"]
    docs = t(spark, SF_DIR, "documents")
    is_new = F.col("doc_id") % _D_MOD == _D_REM
    src = tempfile.mkdtemp(prefix="t2_wm_probe_")
    try:
        new_docs = docs.filter(is_new).select(
            "doc_id",
            "text",
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias(
                "ts"
            ),
        )
        from incubator_flink_old_spark.streaming import (
            write_event_time_replay,
        )

        write_event_time_replay(new_docs, src, n_files=4)
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = streaming_neardup_screen(
            stream,
            docs.filter(~is_new),
            event_time=event_time,
            watermark_delay="30 seconds",
        )
        if event_time is None:
            out = out.drop("ts") if "ts" in out.columns else out
        name = f"wm_probe_{'wm' if event_time else 'plain'}"
        q = run_stream_to_memory(out, name, "append", state_partitions=4)
        emitted = spark.table(name).count()
        per_batch = [
            (
                p["batchId"],
                p["stateOperators"][0]["numRowsTotal"]
                if p["stateOperators"]
                else None,
            )
            for p in q.recentProgress
            if p["numInputRows"] or p["stateOperators"]
        ]
        return emitted, per_batch
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main():
    from incubator_flink_old_spark import get_spark

    globals()["spark"] = get_spark("wm-state-probe")
    for label, et in (("unbounded", None), ("watermarked", "ts")):
        t0 = time.time()
        emitted, per_batch = run(et)
        print(
            f"{label:12s} emitted={emitted} wall={time.time() - t0:.1f}s "
            f"state_rows_per_batch={per_batch}"
        )


if __name__ == "__main__":
    main()
