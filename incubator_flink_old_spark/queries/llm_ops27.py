"""Training-data pipeline queries, wave 42 (round 8, VERDICT r07 item
4): streaming TOP-K BY SCORE with bounded state — the order-statistic
sibling of the SpaceSaving frequency row (q_stream_hh_parity). State is
O(k) per group; the merge is a semilattice (topk(A ∪ B) =
topk(topk(A) ∪ B)), so the final emission is exactly the batch top-k
whatever the microbatch boundaries — the invariance the law test
permutes and the driver row hash-checks against plain window SQL.
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

_SEQ = itertools.count()

_TOPK_K = 5

_STREAM_TOPK_ORACLE = f"""
    SELECT event_type, event_id, value, CAST(rnk AS INT) AS rnk FROM (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY value DESC, event_id
               ) AS rnk
        FROM events) t
    WHERE rnk <= {_TOPK_K}
    """


@register("q_stream_topk_parity", oracle=_STREAM_TOPK_ORACLE)
def q_stream_topk_parity(spark, sf_dir):
    """Streaming bounded-state top-k ⇄ batch window parity
    (streaming.stateful_topk). The events land as FOUR parquet files
    replayed one file per microbatch, so the per-group k-row heap
    genuinely merges across batches through the state store. Top-k is a
    semilattice merge — topk(A ∪ B) = topk(topk(A) ∪ B) — so the LAST
    emission per group is exactly the batch top-k over all rows; the
    readback selects it via the monotone ``seen`` counter (rows
    absorbed per group) rather than a batch-id channel. No arithmetic
    touches the score (pure comparisons on parquet doubles, ties broken
    by event_id), so the hash against the plain ROW_NUMBER window is
    exact.

    Scale: state is O(k) per group forever — the property that makes
    per-key leaderboards viable over unbounded streams; emissions are k
    rows per group per batch, and the readback scans emissions, never
    the source. At 100 TB/day the same operator keeps per-entity
    leaderboards (top documents by quality score, top URLs by spam
    signal) with state independent of stream length."""
    from incubator_flink_old_spark.streaming import (
        run_stream_to_memory,
        stateful_topk,
    )

    src = tempfile.mkdtemp(prefix="t2_topk_src_")
    try:
        (
            t(spark, sf_dir, "events")
            .select("event_type", "event_id", "value")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(
                "event_type string, event_id long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = stateful_topk(stream, k=_TOPK_K)
        name = f"stream_topk_{next(_SEQ)}"
        run_stream_to_memory(out, name, "update", state_partitions=4)
        tbl = spark.table(name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    w = Window.partitionBy("event_type")
    return (
        tbl.withColumn("mx", F.max("seen").over(w))
        .filter(F.col("seen") == F.col("mx"))
        .select(
            "event_type",
            "event_id",
            "value",
            F.col("batch_rank").alias("rnk"),
        )
    )
